"""Build the --py-files archive for cluster deployment.

The north rule runs the engine via ``spark-submit --py-files`` on a
multi-executor cluster; this packages the library (and nothing else — no
tests, no benchmarks, no caches) into a deterministic zip whose members are
importable on every executor:

    python tools/make_pyfiles_zip.py [--out dist/gds_spark.zip]
    spark-submit --py-files dist/gds_spark.zip \
        -m neo4j_graph_data_science_spark.cli pagerank \
        --input transcripts --format iceberg --output scores

Determinism: members are added in sorted order with a fixed timestamp so
the same tree always produces a byte-identical archive (reproducible
deploys; the archive hash can serve as the code-version tag in run
lineage).
"""

from __future__ import annotations

import argparse
import os
import zipfile

PKG = "neo4j_graph_data_science_spark"
FIXED_TS = (2020, 1, 1, 0, 0, 0)


def build(repo_root: str, out_path: str) -> list[str]:
    src_root = os.path.join(repo_root, PKG)
    members: list[str] = []
    for dirpath, dirnames, filenames in os.walk(src_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                members.append(os.path.relpath(full, repo_root))
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for rel in members:
            with open(os.path.join(repo_root, rel), "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(rel.replace(os.sep, "/"), date_time=FIXED_TS)
            info.external_attr = 0o644 << 16
            zf.writestr(info, data, zipfile.ZIP_DEFLATED)
    return members


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="dist/gds_spark.zip")
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    members = build(repo_root, args.out)
    print(f"{args.out}: {len(members)} modules")


if __name__ == "__main__":
    main()
