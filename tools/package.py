"""Package the engine for `spark-submit --py-files` (north-rule packaging
requirement) and optionally smoke-test the submitted job.

  python tools/package.py            # build dist/ocr_gpu_services_spark.zip
  python tools/package.py --smoke    # + spark-submit the tiny extract job
                                     #   with the zip on --py-files and
                                     #   byte-diff the output vs golden/

The zip contains only the package (no tests/tools), so a cluster submit is:

  spark-submit --py-files dist/ocr_gpu_services_spark.zip \
      tools/submit_extract.py --input <pages table> --out <table dir>
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIST = os.path.join(REPO, "dist")
ZIP = os.path.join(DIST, "ocr_gpu_services_spark.zip")


def build_zip() -> str:
    os.makedirs(DIST, exist_ok=True)
    pkg = os.path.join(REPO, "ocr_gpu_services_spark")
    with zipfile.ZipFile(ZIP, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".pyc"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    print(f"built {ZIP} ({os.path.getsize(ZIP)} bytes)")
    return ZIP


def smoke(zip_path: str) -> int:
    import tempfile
    out = tempfile.mkdtemp(prefix="submit_smoke_")
    env = dict(os.environ)
    # PYTHONPATH deliberately NOT set: the job must resolve the package
    # from the --py-files zip alone
    env.pop("PYTHONPATH", None)
    cmd = ["spark-submit", "--master", "local[4]",
           "--py-files", zip_path,
           os.path.join(REPO, "tools", "submit_extract.py"),
           "--scale", "tiny", "--out", os.path.join(out, "extracted")]
    p = subprocess.run(cmd, cwd=tempfile.gettempdir(), env=env,
                       capture_output=True, text=True, timeout=900)
    tail = "\n".join((p.stdout + p.stderr).splitlines()[-15:])
    if p.returncode != 0:
        print(f"spark-submit FAILED:\n{tail}")
        return 1
    print("spark-submit ok:",
          [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1])

    # byte-identity of the submitted job's output vs committed goldens
    sys.path.insert(0, REPO)
    import duckdb
    con = duckdb.connect()
    rows = con.sql(
        "SELECT url, extracted_text FROM "
        f"read_parquet('{out}/extracted/*/*.parquet')").fetchall()
    import hashlib
    bad = 0
    for url, text in rows:
        name = hashlib.sha1(url.encode()).hexdigest() + ".txt"
        gp = os.path.join(REPO, "golden", name)
        want = open(gp, "rb").read() if os.path.exists(gp) else None
        if want is None or (text or "").encode() != want:
            bad += 1
    print(f"golden diff vs submitted output: {bad} mismatches / {len(rows)}")
    return 1 if bad else 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    a = ap.parse_args()
    z = build_zip()
    sys.exit(smoke(z) if a.smoke else 0)
