"""Multi-PROCESS distributed proof: 2 jax.distributed processes cooperate.

Every other distributed artifact in this repo runs in ONE process with
virtual devices; the reference's MPI transport (caput mpiarray — SURVEY
§1 L3) is inherently multi-process.  This tool is the parity proof: two
OS processes, each owning 4 virtual CPU devices, glued by
``jax.distributed`` (gloo CPU collectives) into one 8-device global mesh,
run

1. ``mkfullsky_sharded`` — the ℓ-sharded draw → ℓ→freq all-to-all →
   freq-sharded SHT program.  The all-to-all crosses the process
   boundary; each process then all-gathers the result and checks it
   against a single-device reference computed on its own local device.
2. orbax ``save_sharded`` — BOTH processes write only their own shards —
   followed by ``restore_sharded`` onto a DIFFERENT sharding (the 2-D
   pod mesh from ``make_pod_mesh``, freq split 2 × band 4), asserting
   the reshard-on-restore contract across processes.

Usage:  python tools/multiprocess_proof.py          (parent: spawns 2)
        python tools/multiprocess_proof.py --child I --tmp DIR

Exit code 0 + "ALL OK" from both children is the proof; the parent
writes tools/multiprocess_proof.out with both transcripts.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
PORT = 29719


def child(pid: int, tmp: str) -> None:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    sys.path.insert(0, REPO)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from cora_tpu.parallel import distributed

    assert distributed.initialize(
        coordinator_address=f"localhost:{PORT}", num_processes=2,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, PartitionSpec as P

    from cora_tpu.parallel.mesh import make_mesh, mkfullsky_sharded
    from cora_tpu.parallel import checkpoint as ckpt

    nl, ng = jax.local_device_count(), jax.device_count()
    print(f"[{pid}] local={nl} global={ng}", flush=True)
    assert (nl, ng) == (4, 8)

    nside, nz = 16, 16
    lmax = 3 * nside - 1
    l = np.arange(lmax + 1, dtype=np.float64)
    cl = 1e-6 * (1.0 + l) ** -2.0
    x = np.linspace(0.0, 1.0, nz)
    fc = np.exp(-0.5 * ((x[:, None] - x[None, :]) / 0.1) ** 2)
    corr = (cl[:, None, None] * fc[None]).astype(np.float32)
    key = jax.random.PRNGKey(7)

    # --- program 1: cross-process all-to-all synthesis ------------------
    mesh8 = make_mesh(8)  # spans both processes
    sky8 = mkfullsky_sharded(corr, nside, lmax, key, mesh8)
    sky8_full = np.asarray(
        multihost_utils.process_allgather(sky8, tiled=True)
    )

    # single-device reference on THIS process's own device
    mesh_local = Mesh(np.array(jax.local_devices()[:1]), ("freq",))
    ref = np.asarray(mkfullsky_sharded(corr, nside, lmax, key, mesh_local))

    assert np.isfinite(sky8_full).all()
    dev = np.abs(sky8_full - ref).max()
    scale = np.abs(ref).max()
    assert dev <= 1e-4 * scale, f"2-process != single-device: {dev:.3e}"
    print(f"[{pid}] all-to-all synthesis OK (max dev {dev:.2e}, "
          f"scale {scale:.2e})", flush=True)

    # --- program 2: both processes save shards; restore resharded -------
    path = os.path.join(tmp, "ckpt")
    ckpt.save_sharded(path, {"sky": sky8})
    multihost_utils.sync_global_devices("save_done")

    from cora_tpu.parallel.distributed import make_pod_mesh

    pod = make_pod_mesh(freq_hosts=2)  # (2, 4) freq × band
    like = ckpt.abstract_like(
        {"sky": sky8}, mesh=pod, pspecs={"sky": P("freq")}
    )
    restored = ckpt.restore_sharded(path, like)["sky"]
    assert restored.sharding.mesh.shape == {"freq": 2, "band": 4}
    rest_full = np.asarray(
        multihost_utils.process_allgather(restored, tiled=True)
    )
    assert np.array_equal(rest_full, sky8_full)
    print(f"[{pid}] sharded save + resharded restore OK "
          f"(freq8 -> freq2xband4)", flush=True)

    print(f"[{pid}] ALL OK", flush=True)


def parent() -> int:
    import tempfile

    tmp = tempfile.mkdtemp(prefix="cora_mp_")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--child", str(i), "--tmp", tmp],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\nTIMEOUT"
        outs.append(out)
        rc |= p.returncode if p.returncode is not None else 1
        ok = "ALL OK" in out
        print(f"--- child {i}: rc={p.returncode} ok={ok}")
        rc |= 0 if ok else 1

    art = os.path.join(HERE, "multiprocess_proof.out")
    with open(art, "w") as f:
        f.write(f"# 2-process jax.distributed proof (rc={rc})\n")
        for i, out in enumerate(outs):
            f.write(f"\n===== child {i} =====\n")
            f.write("\n".join(
                ln for ln in out.splitlines()
                if not ln.startswith("WARNING")
            ))
            f.write("\n")
    print(f"# wrote {art}; overall rc={rc}")
    return rc


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--tmp", default=None)
    a = ap.parse_args()
    if a.child is None:
        sys.exit(parent())
    child(a.child, a.tmp)
