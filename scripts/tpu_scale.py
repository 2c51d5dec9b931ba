import sys, time, json
sys.path.insert(0, '/root/repo')
import jax
from mmadmm_tpu.config import load_experiment_config
from mmadmm_tpu.problems import build_problem

for name in ['Monitor180', 'Monitor1160', 'Monitor1320']:
    try:
        cfg = load_experiment_config(f'/root/reference/Experiments/InputFiles/{name}.json')
        cfg.dtype = 'float32'
        t0 = time.time()
        mesh, integ = build_problem(cfg)
        print(name, 'NF', mesh.n_elements, 'build', round(time.time()-t0,1), flush=True)
        state = integ.init_state()
        t0 = time.time()
        state, info = integ.step(state)
        print('  step0 compile+run', round(time.time()-t0,1), 'Ih', float(info.ih_start), flush=True)
        t0 = time.time()
        n = 10
        for _ in range(n):
            state, info = integ.step(state)
        jax.block_until_ready(state.x)
        wall = time.time()-t0
        print('  10 steps', round(wall,2), 's ->', round(n/wall,2), 'steps/s, Ih', float(info.ih_start), flush=True)
    except Exception as e:
        print(name, 'FAILED:', type(e).__name__, str(e)[:300], flush=True)
