"""Pure-Python golden oracle: single-threaded extraction over the fixture
generator, producing the committed golden files pytest and the Spark e2e
tests compare against byte-for-byte (FIXTURES.md §2).

Usage:  python -m ocr_gpu_services_spark.oracle.run [scale] [outdir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

from ..core.extract import extract_document
from ..fixtures.gen import gen_rows

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "golden")


def oracle_records(scale: str = "tiny", seed: int = 7):
    """Yield (url, record) in url order — the golden truth."""
    rows = sorted(gen_rows(scale, seed), key=lambda r: r["url"])
    for row in rows:
        ct, text, spans, doc_type, conf, error = extract_document(
            row["html"], row["text"])
        yield row["url"], {
            "content_type": ct,
            "extracted_text": text,
            "spans": [s.as_dict() for s in spans],
            "doc_type": doc_type,
            "doc_type_conf": conf,
            "n_spans": len(spans),
            "error": error,
        }


def write_goldens(scale: str = "tiny", outdir: str = GOLDEN_DIR, seed: int = 7):
    os.makedirs(outdir, exist_ok=True)
    index = {}
    for url, rec in oracle_records(scale, seed):
        key = hashlib.sha1(url.encode()).hexdigest()
        with open(os.path.join(outdir, key + ".txt"), "wb") as f:
            f.write(rec["extracted_text"].encode("utf-8"))
        index[url] = {
            "file": key + ".txt",
            "content_type": rec["content_type"],
            "n_spans": rec["n_spans"],
            "doc_type": rec["doc_type"],
            "doc_type_conf": rec["doc_type_conf"],
            "error": rec["error"],
        }
    with open(os.path.join(outdir, "index.json"), "w") as f:
        json.dump(index, f, indent=1, sort_keys=True, ensure_ascii=False)
    return index


if __name__ == "__main__":
    scale = sys.argv[1] if len(sys.argv) > 1 else "tiny"
    outdir = sys.argv[2] if len(sys.argv) > 2 else GOLDEN_DIR
    idx = write_goldens(scale, outdir)
    from collections import Counter
    print(f"wrote {len(idx)} goldens to {outdir}")
    print(Counter(v["content_type"] for v in idx.values()))
    print(Counter(v["doc_type"] for v in idx.values()))
    print("errors:", sum(1 for v in idx.values() if v["error"]))
