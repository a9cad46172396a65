import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
import bench
r = bench.run_once(rank=9, blocks_per_step=1, iters=3, delivery="i16", scan_k=4)
print(r)
r2 = bench.run_once(rank=9, blocks_per_step=1, iters=3, delivery="i16", scan_k=0)
print(r2)
