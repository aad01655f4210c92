#!/bin/bash
# Build the reference HM-16.9 encoder/decoder OUT OF TREE as a test
# oracle.  The reference is copied from its read-only mount to /tmp and
# patched only in its build flags (g++-7 -> g++, gnu++14, Eigen via the
# TensorFlow wheel's bundled headers).  Nothing is copied into this
# repository; tests skip when the oracle is absent.
set -euo pipefail
REF=${1:-/root/reference}
DST=${2:-/tmp/hm_oracle}

if [ -x "$DST/bin/TAppDecoderStatic" ] && [ -x "$DST/bin/TAppEncoderStatic" ]; then
  echo "oracle already built at $DST/bin"
  exit 0
fi

rm -rf "$DST"
cp -r "$REF" "$DST"
cd "$DST/build/linux"
# enable the decoder build (the fork comments it out)
sed -i 's/^\t# \$(MAKE) -C lib\/TLibDecoder /\t$(MAKE) -C lib\/TLibDecoder /' makefile
sed -i 's/^\t# \$(MAKE) -C app\/TAppDecoder /\t$(MAKE) -C app\/TAppDecoder /' makefile
# toolchain fixes: g++-7 -> system g++, drop -Werror/-pg, C++14 for Eigen
sed -i 's/^CPP     = g++-7/CPP     = g++/; s/^CC      = gcc-7/CC      = gcc/; s/-Werror//g; s/-pg//g' common/makefile.base
EIG=/tmp/eigeninc
mkdir -p "$EIG"
TF_INC=$(python - <<'EOF'
import tensorflow, os
print(os.path.join(os.path.dirname(tensorflow.__file__), "include"))
EOF
)
ln -sfn "$TF_INC" "$EIG/eigen3"
sed -i "50s|\$| -std=gnu++14 -w -I$EIG|" common/makefile.base
make release -j"$(nproc)"
echo "oracle built: $DST/bin"
