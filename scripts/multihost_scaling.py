"""Multi-process (Gloo) scaling evidence for the sharded ADMM step.

Runs Monitor1160 (76,800 carved-circle triangles) as N OS processes x 1
CPU device each over jax.distributed, halo exchange ON (owner-computes,
default) vs OFF (full-field psum), and records steps/s + the per-iteration
collective payload accounting from the halo plan. Writes
``Results/multihost_scaling.json``.

Hardware caveat recorded in the artifact: this box has 2 physical cores,
so only the 2-process row is contention-free compute scaling; the 4- and
8-process rows oversubscribe the cores and measure CORRECTNESS + the
collective machinery under a real process grid, not speedup (BASELINE's
>=70% host-scaling clause needs real multi-chip hardware — unavailable
here, as every round has noted). What these runs DO establish: the
distributed program runs multi-process, halo and full-psum agree
digit-for-digit, and the halo path's per-iteration all-reduce payload is
two orders of magnitude smaller — the quantity that decides pod-scale
behavior where DCN latency/bandwidth, not local compute, is the limit.

Usage:
  python scripts/multihost_scaling.py            # full matrix, writes JSON
  python scripts/multihost_scaling.py --worker <pid> <nproc> <port> <halo>
"""

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG = "/root/reference/Experiments/InputFiles/Monitor1160.json"
WARMUP = 2
TIMED = 10


def worker(pid: int, nproc: int, port: str, halo: str) -> None:
    os.environ["MMADMM_HALO"] = halo

    import jax

    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.parallel.spmd import initialize_multihost
    from mmadmm_tpu.problems import build_problem

    if nproc > 1:
        initialize_multihost(f"127.0.0.1:{port}", nproc, pid)
    n_dev = jax.device_count()
    cfg = load_experiment_config(CONFIG)
    cfg.dtype = "float32"
    cfg.n_devices = n_dev
    mesh, integ = build_problem(cfg)
    state = integ.init_state()
    for _ in range(WARMUP):
        state, info = integ.step(state)
    jax.block_until_ready(state.x)
    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, info = integ.step(state)
    jax.block_until_ready(state.x)
    dt = time.perf_counter() - t0
    print(
        f"RESULT {json.dumps(dict(pid=pid, nproc=nproc, halo=halo, steps_per_s=round(TIMED / dt, 4), ih=float(info.ih_start)))}",
        flush=True,
    )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def launch(nproc: int, halo: str):
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    procs = []
    for i in range(nproc):
        cmd = [sys.executable, "-u", __file__, "--worker", str(i),
               str(nproc), port, halo]
        if nproc <= 2:  # pin to distinct cores when we have enough
            cmd = ["taskset", "-c", str(i % 2)] + cmd
        procs.append(
            subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, text=True)
        )
    results = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        if p.returncode != 0:
            print(out[-2000:])
            raise RuntimeError(f"worker failed rc={p.returncode}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                results.append(json.loads(line[len("RESULT "):]))
    return results


def payload_table():
    """Cut sizes + per-iteration collective payloads from the halo plan
    (host-side accounting, no run needed)."""
    from mmadmm_tpu.config import load_experiment_config
    from mmadmm_tpu.problems import build_geometry, build_problem

    cfg = load_experiment_config(CONFIG)
    cfg.dtype = "float32"
    mesh, _ = build_problem(cfg)
    rows = {}
    for s in (2, 4, 8):
        sh = mesh.build_shards(s)
        c = int(sh.shared_ids.shape[0])
        rows[s] = dict(
            cut_nodes=c,
            halo_bytes_per_iter=c * mesh.dim * 4,
            full_field_bytes_per_iter=mesh.n_pnts * mesh.dim * 4,
            reduction=round(mesh.n_pnts / max(c, 1), 1),
        )
    return mesh.n_pnts, mesh.n_elements, rows


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4], sys.argv[5])
        return

    n_pnts, n_elems, payloads = payload_table()
    out = dict(
        config="Monitor1160",
        n_pnts=n_pnts,
        n_elements=n_elems,
        timed_steps=TIMED,
        hardware="2-core host; rows with nproc>2 oversubscribe (correctness"
                 " + collective-machinery evidence, not speedup)",
        payload_accounting=payloads,
        runs=[],
    )
    for nproc in (1, 2, 4, 8):
        for halo in (("1",) if nproc == 1 else ("1", "0")):
            t0 = time.perf_counter()
            res = launch(nproc, halo)
            sps = [r["steps_per_s"] for r in res]
            ihs = sorted({r["ih"] for r in res})
            row = dict(
                nproc=nproc, halo=halo == "1",
                steps_per_s=min(sps),  # slowest process = true rate
                ih_after=ihs,
                wall_s=round(time.perf_counter() - t0, 1),
            )
            out["runs"].append(row)
            print(json.dumps(row), flush=True)

    path = os.path.join(REPO, "Results", "multihost_scaling.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
