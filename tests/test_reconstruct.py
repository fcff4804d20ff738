"""Compact wire format <-> on-device reconstruction equivalence.

The invariant: for every item, expand_batch(get_data_compact(id)) must be
BIT-IDENTICAL to get_data(id) for every tensor the models/objective consume
(s_h, per, a_h, a_h_tokens, program, test_*). This is what makes the compact
wire format a pure transport optimization with zero metric risk.
"""

import numpy as np
import pytest

from demo2program_tpu.data import BatchPipeline, create_default_splits
from demo2program_tpu.data.karel_generator import GeneratorConfig, generate
from demo2program_tpu.models.common import ModelConfig
from demo2program_tpu.ops import reconstruct

from tests.test_data import tiny_dataset_dir  # noqa: F401  (fixture)


@pytest.fixture(scope="module")
def ds_and_cfg(tiny_dataset_dir):  # noqa: F811
    ds_train, _, _ = create_default_splits(tiny_dataset_dir, num_k=3)
    item = ds_train.get_data(ds_train.ids[0])
    cfg = ModelConfig(
        model="full", batch_size=4,
        dim_program_token=item["program"].shape[0],
        max_program_len=item["program"].shape[1],
        k=item["s_h"].shape[0], test_k=item["test_s_h"].shape[0],
        max_demo_len=item["s_h"].shape[1],
        h=item["s_h"].shape[2], w=item["s_h"].shape[3],
        depth=item["s_h"].shape[4],
        action_space=item["a_h"].shape[2],
        per_dim=item["per"].shape[2])
    return ds_train, cfg


def _stack(items, keys):
    return {k: np.stack([it[k] for it in items]) for k in keys}


def test_expand_matches_full_loader(ds_and_cfg):
    ds, cfg = ds_and_cfg
    ids = ds.ids[:4]
    full = _stack([ds.get_data(i) for i in ids],
                  ["program", "program_tokens", "program_len", "s_h", "a_h",
                   "a_h_tokens", "per", "demo_len", "test_a_h",
                   "test_a_h_tokens", "test_demo_len"])
    compact_items = [ds.get_data_compact(i) for i in ids]
    compact = _stack(compact_items, [k for k in compact_items[0]
                                     if k != "id"])
    out = reconstruct.expand_batch(compact, cfg)

    np.testing.assert_array_equal(
        np.asarray(out["program"]), full["program"].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["program_tokens"]), full["program_tokens"])
    np.testing.assert_array_equal(
        np.asarray(out["s_h"]), full["s_h"].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["per"]), full["per"].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["a_h"]), full["a_h"].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["a_h_tokens"]), full["a_h_tokens"])
    np.testing.assert_array_equal(
        np.asarray(out["test_a_h"]), full["test_a_h"].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["test_a_h_tokens"]), full["test_a_h_tokens"])


def test_expand_is_noop_on_full_batches(ds_and_cfg):
    ds, cfg = ds_and_cfg
    batch = next(BatchPipeline(ds, batch_size=4, shuffle=False))
    assert reconstruct.expand_batch(batch, cfg) is batch


def test_replay_matches_stored_test_demos(ds_and_cfg):
    """replay_test reproduces the stored unseen-demo state sequences (the
    scorer's execution-accuracy ground truth)."""
    ds, cfg = ds_and_cfg
    ids = ds.ids[:4]
    compact_items = [ds.get_data_compact(i) for i in ids]
    compact = _stack(compact_items, [k for k in compact_items[0]
                                     if k != "id"])
    rep, bs, tk = reconstruct.replay_test(compact, cfg)
    full = _stack([ds.get_data(i) for i in ids],
                  ["test_s_h", "test_demo_len"])
    dlen = compact["test_demo_len"].reshape(bs * tk).astype(np.int32)
    s = np.asarray(reconstruct.assemble_states(rep, dlen))
    T = s.shape[1]
    s = s.reshape(bs, tk, T, cfg.h, cfg.w, 16)
    np.testing.assert_array_equal(s, full["test_s_h"].astype(np.float32))


def test_compact_pipeline_batches(tiny_dataset_dir):  # noqa: F811
    ds_train, _, _ = create_default_splits(tiny_dataset_dir, num_k=3)
    pipe = BatchPipeline(ds_train, batch_size=4, shuffle=True, seed=0,
                         compact=True)
    batch = next(pipe)
    assert batch["c_wall"].shape == (4, 3, 8, 8)
    assert batch["c_a_raw"].shape[0:2] == (4, 3)
    assert batch["c_a_raw"].dtype == np.int8
    assert "s_h" not in batch
    # compact batches are ~50x+ smaller on the wire
    full_bytes = sum(v.nbytes for k, v in
                     next(BatchPipeline(ds_train, 4, shuffle=True,
                                        seed=0)).items() if k != "id")
    compact_bytes = sum(v.nbytes for k, v in batch.items() if k != "id")
    assert compact_bytes * 20 < full_bytes


def test_no_error_dataset_reconstructs(tmp_path):
    """A no-error-mode dataset (blocked moves turn 180 and ARE recorded)
    must also reconstruct exactly — exercises the error-branch replay."""
    d = str(tmp_path / "noerr")
    cfg_g = GeneratorConfig(
        dir_name=d, num_train=6, num_test=2, num_val=2,
        num_demo_per_program=3, num_test_demo_per_program=2,
        min_demo_length=4, max_demo_length=12, seed=5)
    generate(cfg_g, progress_every=0, backend="python")
    ds, _, _ = create_default_splits(d, num_k=3)
    item_f = ds.get_data(ds.ids[0])
    item_c = ds.get_data_compact(ds.ids[0])
    cfg = ModelConfig(
        model="full", batch_size=1,
        dim_program_token=item_f["program"].shape[0],
        max_program_len=item_f["program"].shape[1],
        k=3, test_k=2, max_demo_len=item_f["s_h"].shape[1],
        h=8, w=8, depth=16,
        action_space=item_f["a_h"].shape[2], per_dim=5)
    compact = {k: v[None] for k, v in item_c.items() if k != "id"}
    out = reconstruct.expand_batch(compact, cfg)
    np.testing.assert_array_equal(
        np.asarray(out["s_h"])[0], item_f["s_h"].astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(out["per"])[0], item_f["per"].astype(np.float32))
