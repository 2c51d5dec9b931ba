import time, json, jax
from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem

# 1) precision parity on TPU f32 (Monitor120)
cfg = load_experiment_config('/root/reference/Experiments/InputFiles/Monitor120.json')
cfg.dtype = 'float32'
mesh, integ = build_problem(cfg)
state = integ.init_state()
t0 = time.time()
state, info = integ.step(state)
print('M120 TPU f32 step0 Ih:', float(info.ih_start), '(want 0.844634) compile', round(time.time()-t0,1), flush=True)
t0 = time.time()
for i in range(3):
    state, info = integ.step(state)
    print('  step', i+1, float(info.ih_start), 'iters', int(info.n_iters), flush=True)
print('3 steps wall:', round(time.time()-t0,2), flush=True)

# 2) headline bench (Monitor1320)
cfg = load_experiment_config('/root/reference/Experiments/InputFiles/Monitor1320.json')
cfg.dtype = 'float32'
t0 = time.time()
mesh, integ = build_problem(cfg)
print('M1320 build:', round(time.time()-t0,1), 'NF:', mesh.n_elements, flush=True)
state = integ.init_state()
t0 = time.time()
for _ in range(3):
    state, info = integ.step(state)
jax.block_until_ready(state.x)
print('M1320 warmup(3):', round(time.time()-t0,1), 'Ih:', float(info.ih_start), flush=True)
t0 = time.time()
n = 20
for _ in range(n):
    state, info = integ.step(state)
jax.block_until_ready(state.x)
wall = time.time()-t0
sps = n/wall
print(json.dumps({"metric":"admm_steps_per_s_monitor1320","value":round(sps,3),"unit":"steps/s","vs_baseline":round(sps/(1000.0/52.97),3)}), flush=True)
