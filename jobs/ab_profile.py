"""A/B: local profile vs scale profile (and tmpfs on/off) on the two
shuffle-heaviest headline queries at sf0.1. Usage:
  python jobs/ab_profile.py <local|scale> <tmpfs0|tmpfs1>
Prints one JSON line with per-query seconds + loadavg per sample.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

profile = sys.argv[1]
if sys.argv[2] == "tmpfs1":
    os.environ["REFINED_SPARK_TMPFS_SHUFFLE"] = "1"
else:
    os.environ.pop("REFINED_SPARK_TMPFS_SHUFFLE", None)

from refined_spark import queries as Q
from refined_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="ab", master="local[32]",
                  scale_profile=(profile == "scale"))
spark.sparkContext.setLogLevel("ERROR")

out = {"profile": profile, "tmpfs": sys.argv[2], "load0": os.getloadavg()[0]}
for name in ("minhash_lsh_pairs", "ngram_jaccard", "bio_decode", "er_warm"):
    if name == "er_warm":
        continue
    t0 = time.time()
    Q.QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out[name] = round(time.time() - t0, 2)
out["load1"] = os.getloadavg()[0]
print(json.dumps(out))
spark.stop()
