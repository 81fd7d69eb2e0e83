import sys; sys.path.insert(0, "/root/repo")
import time, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from hybrid_diffusion_tpu.models import DynamicUNet
from hybrid_diffusion_tpu.diffusion import linear_beta_schedule
from hybrid_diffusion_tpu.losses import CompositeLossConfig, DinoPerceptualLoss
from hybrid_diffusion_tpu.train import create_train_state, make_train_step

model = DynamicUNet(T=1000, ch=32, ch_mult=(1, 2), num_res_blocks=1, dropout=0.1, dtype=jnp.bfloat16)
x6 = jnp.zeros((2, 176, 176, 6))
params = jax.jit(model.init)(jax.random.PRNGKey(0), x6, jnp.array([0, 1]))
print("init done", flush=True)
sched = linear_beta_schedule(1e-4, 0.02, 1000)
state = create_train_state(params, model.apply, total_epochs=10, steps_per_epoch=5)
dino = DinoPerceptualLoss(jax.random.PRNGKey(1), image_size=176, dtype=jnp.bfloat16)
step = make_train_step(sched, CompositeLossConfig(), dino_loss_fn=dino, donate=False)
rng = np.random.RandomState(0)
batch = {"input": jnp.asarray(rng.randint(0,255,(2,176,176,3),dtype=np.uint8)),
         "gt": jnp.asarray(rng.randint(0,255,(2,176,176,3),dtype=np.uint8))}
t0=time.time(); state, m = step(state, batch, jax.random.PRNGKey(2))
jax.block_until_ready(state.params)
print(f"train step compile+run {time.time()-t0:.0f}s", {k: float(v) for k,v in m.items()}, flush=True)
t0=time.time()
for i in range(5):
    state, m = step(state, batch, jax.random.PRNGKey(3+i))
jax.block_until_ready(state.params)
print(f"5 warm steps {(time.time()-t0)/5*1000:.0f}ms/step", flush=True)
