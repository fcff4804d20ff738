"""ViZDoom dataset loader + model-path tests using a synthetic engine-free
dataset with the reference schema."""

import os

import h5py
import numpy as np
import pytest

from demo2program_tpu.data.vizdoom_dataset import (
    VizdoomDataset, create_vizdoom_splits)
from demo2program_tpu.data.merge_datasets import merge
from demo2program_tpu.dsl.vizdoom_vocab import VizDoomDSLVocab

H = W = 32  # small frames keep the conv test cheap
C = 3
KD, TKD = 3, 2  # demos / test demos per program
PER = 3  # 'more_simple' percepts


def _write_fake_vizdoom(dir_name, num_train=6, num_test=2, num_val=2,
                        seed=0):
    os.makedirs(dir_name, exist_ok=True)
    rng = np.random.RandomState(seed)
    vocab = VizDoomDSLVocab(perception_type="more_simple")
    code = "DEF run m( WHILE c( ISTHERE Demon c) w( ATTACK w) m)"
    prog = np.array(vocab.str2intseq(code), np.int8)
    num_total = num_train + num_test + num_val
    pos_keys = ["player_pos", "demon_pos", "hellknight_pos",
                "revenant_pos", "ammo_pos"]
    f = h5py.File(os.path.join(dir_name, "data.hdf5"), "w")
    ids = []
    max_len = 6
    for i in range(num_total):
        T = int(rng.randint(3, max_len + 1))
        id_ = f"no_{i}_prog_len_{len(prog)}_max_s_h_len_{T}"
        ids.append(id_)
        g = f.create_group(id_)
        g["program"] = prog
        g["s_h"] = rng.randint(0, 255, size=(KD, T, H, W, C)).astype(
            np.int16)
        g["s_h_len"] = np.full(KD, T, np.int16)
        g["a_h"] = rng.randint(0, 11, size=(KD, T - 1)).astype(np.int8)
        g["a_h_len"] = np.full(KD, T - 1, np.int16)
        g["p_v_h"] = rng.rand(KD, T, PER) > 0.5
        g["test_s_h"] = rng.randint(
            0, 255, size=(TKD, T, H, W, C)).astype(np.int16)
        g["test_s_h_len"] = np.full(TKD, T, np.int16)
        g["test_a_h"] = rng.randint(0, 11, size=(TKD, T - 1)).astype(np.int8)
        g["test_a_h_len"] = np.full(TKD, T - 1, np.int16)
        g["test_p_v_h"] = rng.rand(TKD, T, PER) > 0.5
        g["vizdoom_init_pos"] = rng.randint(
            -480, 64, size=(KD, len(pos_keys), 5, 2)).astype(np.int32)
        g["vizdoom_init_pos_len"] = np.full((KD, len(pos_keys)), 5, np.int32)
        g["test_vizdoom_init_pos"] = rng.randint(
            -480, 64, size=(TKD, len(pos_keys), 5, 2)).astype(np.int32)
        g["test_vizdoom_init_pos_len"] = np.full(
            (TKD, len(pos_keys)), 5, np.int32)
    info = f.create_group("data_info")
    info["max_demo_length"] = max_len
    info["max_program_length"] = len(prog)
    info["num_program_tokens"] = vocab.num_program_tokens
    info["num_demo_per_program"] = KD
    info["num_test_demo_per_program"] = TKD
    info["num_action_tokens"] = vocab.num_action_tokens
    info["num_train"] = num_train
    info["num_test"] = num_test
    info["num_val"] = num_val
    info["s_h_h"] = H
    info["s_h_w"] = W
    info["s_h_c"] = C
    info["percepts"] = ["ISTHERE Demon", "ISTHERE HellKnight",
                        "ISTHERE Revenant"]
    info["vizdoom_pos_keys"] = pos_keys
    info["vizdoom_max_init_pos_len"] = 5
    info["perception_type"] = "more_simple"
    f.close()
    with open(os.path.join(dir_name, "id.txt"), "w") as fp:
        fp.write("\n".join(ids) + "\n")


@pytest.fixture(scope="session")
def fake_vizdoom_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vizdoom_fake"))
    _write_fake_vizdoom(d)
    return d


def test_vizdoom_loader(fake_vizdoom_dir):
    ds_train, ds_test, ds_val = create_vizdoom_splits(
        fake_vizdoom_dir, num_k=2)
    assert (len(ds_train), len(ds_test), len(ds_val)) == (6, 2, 2)
    item = ds_train.get_data(ds_train.ids[0])
    T = ds_train.max_demo_len
    assert item["s_h"].shape == (2, T, H, W, C)         # num_k sliced
    assert item["test_s_h"].shape == (TKD, T, H, W, C)
    assert item["a_h"].shape == (2, T, 12)              # 11 actions + <e>
    assert item["per"].shape == (2, T, PER)
    assert item["init_pos"].shape == (2, 5, 5, 2)
    assert item["init_pos_len"].shape == (2, 5)
    assert item["test_init_pos"].shape == (TKD, 5, 5, 2)
    # raw pixel scale preserved
    assert item["s_h"].max() > 1.5


def test_vizdoom_full_model_forward(fake_vizdoom_dir):
    import jax
    import types
    from demo2program_tpu.train.trainer import config_from_dataset
    from demo2program_tpu.models.full import FullModel
    from demo2program_tpu.models import objective
    from demo2program_tpu.data import BatchPipeline
    from demo2program_tpu.train.step import strip_non_tensor

    ds_train, _, _ = create_vizdoom_splits(fake_vizdoom_dir, num_k=2)
    args = types.SimpleNamespace(
        model="full", dataset_type="vizdoom", batch_size=2,
        num_lstm_cell_units=32, demo_aggregation="avgpool",
        scheduled_sampling=False, scheduled_sampling_decay_steps=100)
    cfg = config_from_dataset(args, ds_train)
    assert cfg.depth == C and cfg.h == H
    assert cfg.perception_type == "more_simple"
    assert cfg.program_end_token == 3
    assert len(cfg.vizdoom_pos_keys) == 5

    batch = next(BatchPipeline(ds_train, 2, shuffle=False))
    batch = strip_non_tensor(batch)
    model = FullModel(cfg, train=True)
    variables = model.init(jax.random.key(0), batch)
    # the vizdoom path uses the 5-conv state encoder
    enc_params = variables["params"]["encoder"]["demo_encoder"][
        "state_encoder"]
    assert "conv5" in enc_params
    out, _ = model.apply(variables, batch, mutable=["batch_stats"])
    loss, report = objective.compute_loss(cfg, out, batch, "full")
    assert np.isfinite(float(loss))

    # engine-free part of the doom scorer: syntax + canonical
    from demo2program_tpu.eval.vizdoom_scorer import VizdoomScorer
    from demo2program_tpu.models.objective import program_eval_tensors
    evals = jax.device_get(program_eval_tensors(cfg, out, batch))
    scorer = VizdoomScorer(cfg)
    scores = scorer.score_batch(batch, evals, skip_execution=True)
    assert 0.0 <= scores["greedy_program_syntax_acc"] <= 1.0


def test_merge_datasets(fake_vizdoom_dir, tmp_path):
    d2 = str(tmp_path / "shard2")
    _write_fake_vizdoom(d2, seed=9)
    out = str(tmp_path / "merged")
    merge([fake_vizdoom_dir, d2], out)
    ds_train, ds_test, ds_val = create_vizdoom_splits(out, num_k=2)
    assert len(ds_train) + len(ds_test) + len(ds_val) == 20
    item = ds_train.get_data(ds_train.ids[0])
    assert item["s_h"].shape[0] == 2
