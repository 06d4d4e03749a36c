"""Profile the ARTS 2V value_and_grad on TPU."""
import os, time, json
import numpy as np, yaml
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
import jax.numpy as jnp
from tsadar_tpu.core.diagnostic import ThomsonScatteringDiagnostic
from tsadar_tpu.core.params import ThomsonParams, get_filter_spec, partition, combine
from tsadar_tpu.utils.config import merge_configs, set_forward_ranges
from tsadar_tpu.utils.data_handling.calibration import get_scattering_angles, get_calibrations

with open("tests/configs/arts2v_test_defaults.yaml") as fi: defaults = yaml.safe_load(fi)
with open("tests/configs/arts2d_test_inputs.yaml") as fi: inputs = yaml.safe_load(fi)
config = set_forward_ranges(merge_configs(defaults, inputs))
fe_cfg = config["parameters"]["electron"]["fe"]
fe_cfg["type"] = "arbitrary"; fe_cfg["dim"] = 2; fe_cfg["nvx"] = 128
fe_cfg.setdefault("params", {}); fe_cfg["params"].setdefault("init_m", 2.5); fe_cfg["params"].setdefault("learn_log", True)
sas = get_scattering_angles(config)
axisxE, *_ = get_calibrations(104000, config["other"]["extraoptions"]["spectype"], 0.0, config["other"]["CCDsize"])
config["other"]["extraoptions"]["spectype"] = "angular_full"
sas["angAxis"] = axisxE
batch = {"e_data": np.ones(tuple(config["other"]["CCDsize"])), "i_data": np.ones(tuple(config["other"]["CCDsize"])),
         "e_amps": np.array([1.0]), "i_amps": np.array([1.0]), "noise_e": np.array([0.0]), "noise_i": np.array([0.0])}
ts_diag = ThomsonScatteringDiagnostic(config, scattering_angles=sas, mode_2v="table")
ts_params = ThomsonParams.create(config["parameters"], num_params=1, batch=False, activate=True)
fwd = jax.jit(lambda p, b: ts_diag(p, b)[0])
target = np.asarray(jax.block_until_ready(fwd(ts_params, batch)))
diff, static = partition(ts_params, get_filter_spec(config["parameters"], ts_params))
def loss(dp):
    T = ts_diag(combine(dp, static), batch)[0]
    return jnp.mean((T - target * 0.9) ** 2)
vg = jax.jit(jax.value_and_grad(loss))
o = vg(diff); jax.block_until_ready(o[0])
for _ in range(3): o = vg(diff)
jax.block_until_ready(o[0])
t0 = time.perf_counter()
for _ in range(10): o = vg(diff)
jax.block_until_ready(o[0])
print(f"vg_ms: {(time.perf_counter()-t0)/10*1e3:.2f}")
with jax.profiler.trace("/tmp/arts_trace"):
    for _ in range(5): o = vg(diff)
    jax.block_until_ready(o[0])
print("trace done")
