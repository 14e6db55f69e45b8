import sys
from genpipe_spark import registry
from genpipe_spark.session import get_spark
from tests.oracle_utils import compare, run_oracle

registry.load_all_query_modules()
spark = get_spark("check", cpus=8, shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")
SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
names = sys.argv[2:] or [n for n in registry.QUERIES if n in registry.ORACLES]
fails = 0
for n in names:
    try:
        probs = compare(registry.QUERIES[n](spark, SF), run_oracle(registry.ORACLES[n], SF))
        if probs:
            fails += 1
            print("FAIL " + n, str(probs)[:500])
        else:
            print("PASS " + n)
    except Exception as e:
        fails += 1
        print("ERR  " + n, repr(e)[:400])
spark.stop()
sys.exit(1 if fails else 0)
