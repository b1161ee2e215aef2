"""Multi-process (multi-host-style) training validation on CPU.

Spawns TWO separate processes that form a jax.distributed cluster (the
same `jax.distributed.initialize` path `apps/train.py --distributed`
uses), each owning 2 virtual CPU devices -> a 4-device global mesh. Each
process feeds its LOCAL half of the global batch through
`device_prefetch` / `make_array_from_process_local_data`, runs the real
sharded dual-stream train step for a few steps, and prints a checksum of
its (replicated) parameters. The driver asserts the two processes agree —
i.e. gradient psum actually synchronized them across process boundaries.

  python scripts/validate_distributed_cpu.py            # driver
  (internally re-execs itself with --process-id for the two workers)

This validates the cross-process wiring the TPU-pod path relies on
(ROADMAP item: multi-host training was previously single-process-tested
only). On a pod, the same code runs with real ICI/DCN collectives.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
STEPS = 3
GLOBAL_BATCH = 8


def worker(process_id: int, port: int):
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=2'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(
        coordinator_address=f'localhost:{port}',
        num_processes=N_PROC, process_id=process_id)
    import jax.numpy as jnp
    import numpy as np

    from metrabs_tpu.config import ModelConfig, TrainConfig
    from metrabs_tpu.data.pipeline import device_prefetch
    from metrabs_tpu.models.backbones.tiny import TinyBackbone
    from metrabs_tpu.models.metrabs import Metrabs
    from metrabs_tpu.parallel import mesh as mesh_mod
    from metrabs_tpu.pipeline.skeletons import H36M_17, LSP_14
    from metrabs_tpu.train import loop as loop_mod, optim

    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * 2  # global view

    res = 64
    cfg = ModelConfig(proc_side=res, depth=4, n_joints=17, dtype='float32')
    tcfg = TrainConfig(training_steps=100)
    model = Metrabs(cfg=cfg, backbone=TinyBackbone(width=8, dtype=jnp.float32))
    tx = optim.build_optimizer(tcfg)
    state = loop_mod.create_train_state(model, tx, jax.random.PRNGKey(0), cfg)
    step_fn = loop_mod.make_train_step(model, tx, H36M_17, LSP_14, cfg, tcfg)
    mesh = mesh_mod.make_mesh()
    sharded_step = loop_mod.make_sharded_train_step(step_fn, mesh)

    # Each process loads its LOCAL half of the global batch — different data
    # per process (seeded by process id), like the real loader shards.
    local_n = GLOBAL_BATCH // N_PROC
    rng = np.random.default_rng(100 + process_id)
    K = np.array([[250.0, 0, res / 2], [0, 250.0, res / 2], [0, 0, 1]],
                 np.float32)

    def local_batches():
        while True:
            b3 = dict(
                image=rng.uniform(size=(local_n, res, res, 3)).astype(
                    np.float32),
                intrinsics=np.tile(K[None], (local_n, 1, 1)),
                coords3d_true=(rng.normal(size=(local_n, 17, 3)) * 200
                               + [0, 0, 3000]).astype(np.float32),
                joint_validity_mask=np.ones((local_n, 17), bool))
            b2 = dict(
                image=rng.uniform(size=(local_n, res, res, 3)).astype(
                    np.float32),
                intrinsics=np.tile(K[None], (local_n, 1, 1)),
                coords2d_true=rng.uniform(
                    10, res - 10, size=(local_n, 14, 2)).astype(np.float32),
                joint_validity_mask=np.ones((local_n, 14), bool))
            yield b3, b2

    sharding = mesh_mod.batch_sharding(mesh)
    feed = device_prefetch(local_batches(), sharding)
    with mesh:
        for i in range(STEPS):
            b3, b2 = next(feed)
            assert b3['image'].shape[0] == GLOBAL_BATCH  # global jax.Array
            state, losses = sharded_step(state, b3, b2,
                                         jax.random.fold_in(
                                             jax.random.PRNGKey(7), i))
    # Replicated state must be IDENTICAL across processes after psum'd
    # gradient steps; checksum the local view of the replicated params.
    leaves = jax.tree_util.tree_leaves(state.params)
    checksum = float(sum(
        np.asarray(jax.device_get(l)).astype(np.float64).sum()
        for l in leaves))

    # Data-sharding validation: with the SAME seed, shard_example_stream
    # (the train.py --distributed wiring) must hand each process a DISJOINT
    # slice of every global round-robin block — the driver asserts
    # disjointness + coverage across the two processes' reports.
    import itertools
    from metrabs_tpu.data.pipeline import (
        roundrobin_iterate, shard_example_stream)
    stream = roundrobin_iterate(
        [list(range(0, 100)), list(range(100, 200))], [2, 2],
        np.random.default_rng(42))
    local_ids = list(itertools.islice(
        shard_example_stream(stream, 8, jax.process_index(),
                             jax.process_count()), 12))

    print(json.dumps({'process': process_id,
                      'loss': float(losses['loss']),
                      'checksum': checksum,
                      'example_ids': local_ids}), flush=True)
    jax.distributed.shutdown()


def _free_port() -> int:
    import socket
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--process-id', type=int, default=None)
    parser.add_argument('--port', type=int, default=None)
    args = parser.parse_args()
    if args.process_id is not None:
        worker(args.process_id, args.port)
        return

    # Ephemeral coordinator port: a fixed port would make one hung run
    # block every later invocation until the orphans are killed.
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         '--process-id', str(i), '--port', str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(N_PROC)]
    try:
        outs = [p.communicate(timeout=1200)[0] for p in procs]
    except subprocess.TimeoutExpired:
        for p in procs:  # don't leak workers holding the coordinator
            p.kill()
        for p in procs:
            p.wait()
        raise SystemExit('worker timed out after 1200 s')
    results = {}
    for out, p in zip(outs, procs):
        if p.returncode != 0:
            print(out)
            raise SystemExit(f'worker failed rc={p.returncode}')
        for line in out.splitlines():
            if line.startswith('{'):
                rec = json.loads(line)
                results[rec['process']] = rec
    assert set(results) == set(range(N_PROC)), results
    c0, c1 = (results[i]['checksum'] for i in range(N_PROC))
    l0, l1 = (results[i]['loss'] for i in range(N_PROC))
    print(f'losses: {l0:.6f} / {l1:.6f}   checksums: {c0:.6f} / {c1:.6f}')
    assert c0 == c1, 'replicated params diverged across processes!'
    assert l0 == l1, 'loss (psum-averaged metric) differs across processes!'
    ids0, ids1 = (results[i]['example_ids'] for i in range(N_PROC))
    assert not set(ids0) & set(ids1), (
        f'example streams overlap across processes: {ids0} / {ids1}')
    assert len(set(ids0)) == len(ids0) and len(set(ids1)) == len(ids1), (
        'duplicate examples within a process slice')
    print(f'example streams disjoint: p0={ids0[:6]}... p1={ids1[:6]}...')
    print('DISTRIBUTED CPU VALIDATION OK '
          f'({N_PROC} processes x 2 devices, {STEPS} steps)')


if __name__ == '__main__':
    main()
