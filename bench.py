"""Benchmark: Karel full-model training throughput in demos/sec/chip.

Runs the flagship FullModel training step at the reference's Karel regime
(batch 32, k=10 demos, T=20, 8x8x16 grids, 512 LSTM units — README.md:100-110
and trainer.py defaults) on synthetic data and reports steady-state
throughput.

Baseline: the reference logs `1.896 sec/batch, 16.878 instances/sec` on its
original setup (README.md:96) = 16.878 programs/sec x 10 demos =
168.78 demos/sec. vs_baseline is measured against that number.

Prints exactly one JSON line:
  {"metric": "train_demos_per_sec_per_chip", "value": N, "unit": "demos/s",
   "vs_baseline": N/168.78}
"""

import json
import time

import jax
import numpy as np


BASELINE_DEMOS_PER_SEC = 16.878 * 10  # reference README.md:96, k=10


def main():
    from demo2program_tpu.models.common import ModelConfig
    from demo2program_tpu.models.full import FullModel
    from demo2program_tpu.parallel import make_mesh, replicated_sharding
    from demo2program_tpu.parallel.mesh import shard_batch
    from demo2program_tpu.train.step import (
        create_train_state, make_optimizer, make_train_step)
    from __graft_entry__ import _random_batch

    cfg = ModelConfig(model="full", batch_size=32, num_lstm_cell_units=512,
                      k=10, test_k=5, max_demo_len=20, max_program_len=45,
                      cell_impl="pallas")  # fused LSTM kernel: ~1.5x vs xla
    bs = cfg.batch_size
    n_chips = jax.device_count()
    batch = _random_batch(cfg, bs)

    mesh = make_mesh()
    model = FullModel(cfg, train=True)
    tx = make_optimizer(cfg, 1e-3)
    state = create_train_state(model, cfg, tx, jax.random.key(0), batch)
    state = jax.device_put(state, replicated_sharding(mesh))
    sharded = shard_batch(batch, mesh)
    train_step = make_train_step(model, cfg, tx, "full", donate=True)

    rng = jax.random.key(1)
    # warmup / compile
    state, report = train_step(state, sharded, rng)
    jax.block_until_ready(report["loss"])

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        state, report = train_step(state, sharded, rng)
    jax.block_until_ready(report["loss"])
    dt = (time.perf_counter() - t0) / iters

    demos_per_sec = bs * cfg.k / dt
    per_chip = demos_per_sec / n_chips
    print(json.dumps({
        "metric": "train_demos_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "demos/s",
        "vs_baseline": round(per_chip / BASELINE_DEMOS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
