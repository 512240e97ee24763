import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__
from data_transform_spark.registry import QUERIES, ORACLES
from data_transform_spark.session import get_spark
from tests.oracle import duckdb_connect

sf = "/root/testdata/sf0.001"
spark = get_spark("dtype-audit")
con = duckdb_connect(sf)
for key in sorted(ORACLES):
    try:
        spdf = QUERIES[key](spark, sf).toPandas()
        odf = con.sql(ORACLES[key]).df()
        diffs = []
        for c in sorted(spdf.columns):
            st, ot = str(spdf[c].dtype), str(odf[c].dtype)
            if st != ot:
                diffs.append(f"{c}: spark={st} oracle={ot}")
        if diffs:
            print(f"DTYPE {key}: " + "; ".join(diffs), flush=True)
    except Exception as e:
        print(f"ERR {key}: {type(e).__name__} {str(e)[:80]}", flush=True)
print("AUDIT DONE", flush=True)
