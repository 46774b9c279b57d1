"""Package dqc_spark into a --py-files zip for spark-submit."""

import os
import sys
import zipfile

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dqc_spark.zip"
with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(repo, "dqc_spark")
    for root, _, files in os.walk(pkg):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, os.path.relpath(p, repo))
print(out)
