"""f32 precision envelope audit: TPU-f32 vs CPU-f64 forward spectra.

Samples the active-parameter box (logit-space draws so sigmoid-activated
normed values span (0.02, 0.98) of each [lb, ub] range), evaluates the 1V
forward on the live backend in f32 and on the CPU backend in f64 (in the
same process, via jax.default_device + the x64 context), and prints the
per-lineout max |dev| / peak for both spectra, ordered by sqrt(ne/Te)
(proportional to the scattering parameter alpha).

Findings and interpretation: docs/precision.md.  Writes /tmp/envelope.npz.
"""
import sys
sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
import jax.tree_util as jtu
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
from __graft_entry__ import _small_config, _make_batch
from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles
from tsadar_tpu.core.physics.interp import pallas_disabled

B = 32
cfg = _small_config(B)
sas = get_scattering_angles(cfg)
ts_params = ThomsonParams.create(cfg["parameters"], num_params=B, batch=True, activate=True)
batch = _make_batch(B, 1024)
spec = get_filter_spec(cfg["parameters"], ts_params)
diff, static = partition(ts_params, spec)
rng = np.random.default_rng(7)
leaves, tdef = jtu.tree_flatten(diff)
# logit-space draws: sigmoid(normed) spans (0.02, 0.98) of each [lb, ub] box
u = [rng.uniform(0.02, 0.98, np.shape(l)) for l in leaves]
diff_r = jtu.tree_unflatten(tdef, [jnp.asarray(np.log(x / (1 - x)), jnp.float32) for x in u])

ts_diag = ThomsonScatteringDiagnostic(cfg, scattering_angles=sas)
fwd = jax.jit(lambda d, b: ts_diag(combine(d, static), b)[:2])
E_t, I_t = map(np.asarray, jax.block_until_ready(fwd(diff_r, batch)))

try:
    from jax.experimental import enable_x64
except ImportError:
    from jax._src.config import enable_x64
cpu = jax.devices("cpu")[0]
f64 = lambda t: jtu.tree_map(lambda a: jax.device_put(np.asarray(a).astype(np.float64) if np.issubdtype(np.asarray(a).dtype, np.floating) else np.asarray(a), cpu), t)
with enable_x64(True), jax.default_device(cpu), pallas_disabled():
    ts64 = ThomsonParams.create(cfg["parameters"], num_params=B, batch=True, activate=True)
    _, static64 = partition(ts64, get_filter_spec(cfg["parameters"], ts64))
    diag64 = ThomsonScatteringDiagnostic(cfg, scattering_angles=sas)
    fwd64 = jax.jit(lambda d, b: diag64(combine(d, static64), b)[:2])
    E_64, I_64 = map(np.asarray, jax.block_until_ready(fwd64(f64(diff_r), f64(batch))))

phys = jtu.tree_map(np.asarray, combine(diff_r, static)())
Te = phys["electron"]["Te"].ravel(); ne = phys["electron"]["ne"].ravel()
alpha = np.sqrt(ne / Te)
perE = (np.abs(E_t - E_64) / np.max(np.abs(E_64), -1, keepdims=True)).reshape(B, -1).max(-1)
perI = (np.abs(I_t - I_64) / np.max(np.abs(I_64), -1, keepdims=True)).reshape(B, -1).max(-1)
for i in np.argsort(alpha):
    print(f"Te={Te[i]:.3f} ne={ne[i]:.3f} sqrt(ne/Te)={alpha[i]:.2f} devE={perE[i]:.2e} devI={perI[i]:.2e}")
np.savez("/tmp/envelope.npz", Te=Te, ne=ne, alpha=alpha, perE=perE, perI=perI)
