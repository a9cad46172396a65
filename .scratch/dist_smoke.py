import os, sys
sys.path.insert(0, "/root/repo")
pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 1)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=n, process_id=pid)
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P, NamedSharding
print(f"[{pid}] global devices:", jax.device_count(), "local:", jax.local_device_count(), flush=True)
mesh = Mesh(jax.devices(), ("x",))
import numpy as np
local = np.full((1, 4), pid + 1.0, np.float32)
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("x", None)), local)
s = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(arr)
from jax.experimental import multihost_utils
val = multihost_utils.process_allgather(s, tiled=True)
print(f"[{pid}] sum = {val} (expect 12.0)", flush=True)
assert float(np.asarray(val).ravel()[0]) == 12.0
print(f"[{pid}] OK", flush=True)
