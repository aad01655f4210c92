"""Access to the reference HM-16.9 binaries used as an *external*
conformance oracle in tests.

The binaries are built out-of-tree (in /tmp) from the read-only
reference checkout by tools/build_reference_oracle.sh; no reference
code lives in this repo.  All tests using the oracle must skip cleanly
when it is absent.
"""
import os
import shutil
import subprocess

ORACLE_DIR = os.environ.get("HMTPU_ORACLE_DIR", "/tmp/hm_oracle/bin")
DECODER = os.path.join(ORACLE_DIR, "TAppDecoderStatic")
ENCODER = os.path.join(ORACLE_DIR, "TAppEncoderStatic")


def have_decoder() -> bool:
    return os.path.exists(DECODER)


def have_encoder() -> bool:
    return os.path.exists(ENCODER)


def decode(bitstream_path: str, recon_path: str, timeout: int = 300) -> str:
    """Run the reference decoder; returns stdout. Raises on failure or
    hash mismatch (the decoder prints (OK)/(***ERROR***) per POC)."""
    res = subprocess.run(
        [DECODER, "-b", bitstream_path, "-o", recon_path],
        capture_output=True, text=True, timeout=timeout,
    )
    if res.returncode != 0:
        raise RuntimeError(f"reference decoder failed:\n{res.stdout}\n{res.stderr}")
    return res.stdout
