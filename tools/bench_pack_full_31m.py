import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json, time
from webgraph_spark.session import get_spark
from webgraph_spark.operators.bvfull import pack_bv_full, unpack_bv_full, bv_full_model_bits
from webgraph_spark.operators.bitstream import pack_bv, bv_bits_per_link

spark = get_spark("pack31m", master="local[32]", shuffle_partitions=64)
e = spark.read.parquet("/dev/shm/scaling_edges_31m").persist(); n = e.count()
out = {"n_arcs": n, "results": {}}
t0 = time.time(); z = pack_bv(e, num_blocks=64, code="zeta3").persist(); z.count()
out["results"]["pack_bv_zeta3"] = {"wall_s": round(time.time()-t0,1)}
t0 = time.time(); r = bv_bits_per_link(z).collect()[0]
out["results"]["zeta3_bits"] = {"wall_s": round(time.time()-t0,1), "bits_per_link": round(r["bits_per_link"],4)}
z.unpersist()
t0 = time.time(); f = pack_bv_full(e, num_blocks=64).persist(); f.count()
out["results"]["pack_bv_full"] = {"wall_s": round(time.time()-t0,1)}
t0 = time.time(); arcs = unpack_bv_full(f).count()
out["results"]["unpack_bv_full"] = {"wall_s": round(time.time()-t0,1), "arcs": arcs}
t0 = time.time(); m = bv_full_model_bits(f).collect()[0]
out["results"]["bv_full_model_bits"] = {"wall_s": round(time.time()-t0,1),
    "bits_per_link": round(m["model_bits"]/n,4), "physical_bits_per_link": round(m["physical_bits"]/n,4)}
assert arcs == n, (arcs, n)
with open("/root/repo/BENCH/pack_full_31m.json","w") as fo: json.dump(out,fo,indent=2)
print("DONE31M", json.dumps(out))
