import time, numpy as np, jax, jax.numpy as jnp
t0 = time.time()
x = jnp.ones((8, 128), jnp.float32)
y = jax.jit(lambda a: a * 2.0 + 1.0)(x)
v = np.asarray(y)
print("tunnel ok", v[0, 0], "latency", round(time.time() - t0, 2), "s", jax.devices())
