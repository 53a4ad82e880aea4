"""Build dist/graphjet_spark.zip for spark-submit --py-files.

    python jobs/make_dist.py
    spark-submit --master <master> --py-files dist/graphjet_spark.zip \
        jobs/pagerank_job.py --cores 8 --edges 64000000 --iters 8
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    out = os.path.join(REPO, "dist", "graphjet_spark.zip")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "graphjet_spark")
        for root, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
