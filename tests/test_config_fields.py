"""Config honesty: every accepted field must be read somewhere in the package.

Round-1 verdict found six accepted-but-ignored fields (train_emb, tensorboard,
test_count, a_fold, test_batch_size, param_dtype) — a ported reference
invocation silently changed behavior. This test pins the invariant that a field
existing on Config implies some module consumes it.
"""

import dataclasses
import pathlib
import re

import jax
import jax.numpy as jnp
import numpy as np

import furusato_recommend_tpu
from furusato_recommend_tpu.config import Config, MeshConfig


def test_no_dead_config_fields():
    pkg = pathlib.Path(furusato_recommend_tpu.__file__).parent
    src = "".join(
        p.read_text() for p in pkg.rglob("*.py") if p.name != "config.py"
    )
    dead = [
        f.name
        for f in dataclasses.fields(Config)
        if not re.search(rf"\.{f.name}\b", src)
    ]
    assert not dead, f"Config fields accepted but never read: {dead}"


def test_from_json_ignores_unknown_fields():
    s = Config().to_json()
    import json

    d = json.loads(s)
    d["test_batch_size"] = 10000  # removed round-2; old checkpoints carry it
    c = Config.from_json(json.dumps(d))
    assert c == Config()


def test_param_dtype_casts_tables():
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.models.registry import build_model

    ds = synthetic_dataset(n_users=32, m_items=48, avg_degree=6, seed=0)
    cfg = Config(model="mf", latent_dim=8, param_dtype="bfloat16")
    model = build_model("mf", cfg, ds.graph)
    params = model.init(jax.random.PRNGKey(0))
    assert params["user_emb"].dtype == jnp.bfloat16


def test_tensorboard_sink_writes_events(tmp_path):
    from furusato_recommend_tpu.obs.log import MetricLogger

    lg = MetricLogger(tensorboard_dir=tmp_path / "tb", quiet=True)
    lg.log({"loss": 1.0, "recall@10": 0.5}, step=3)
    lg.close()
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_testbatch_flag_sets_eval_tile():
    from furusato_recommend_tpu.cli import build_argparser, config_from_args

    args = build_argparser().parse_args(["--testbatch", "512"])
    cfg = config_from_args(args)
    assert cfg.eval_user_batch == 512


def test_ddp_recipe_truncates_eval_to_test_count():
    """TEST_COUNT eval truncation (/root/reference/ddp.py:826-847) must reach
    build_eval_data through the Trainer's ddp_recipe path."""
    from furusato_recommend_tpu.data import synthetic_dataset
    from furusato_recommend_tpu.models.registry import build_model
    from furusato_recommend_tpu.train.trainer import Trainer

    ds = synthetic_dataset(n_users=64, m_items=96, avg_degree=6, seed=0)
    cfg = Config(
        model="mf", latent_dim=8, bpr_batch_size=64, eval_user_batch=16, test_count=2
    )
    model = build_model("mf", cfg, ds.graph)
    tr = Trainer(cfg, ds, model, ddp_recipe=True)
    # 64 test users, tile 16, capped at 2 batches -> 32 users
    assert tr.eval_data.users.shape == (2, 16)
    tr_full = Trainer(cfg, ds, model, ddp_recipe=False)
    assert tr_full.eval_data.users.shape[0] * 16 >= 64


def test_cli_load_warm_start(tmp_path, capsys):
    """--load warm-starts from the config-path checkpoint (the reference
    parses the flag but never reads it; the DDP flagship hard-codes the same
    behavior, ddp.py:794)."""
    from furusato_recommend_tpu.cli import main

    cf = tmp_path / "cf"
    cf.mkdir()
    rng = np.random.default_rng(3)
    with open(cf / "train.txt", "w") as ftr, open(cf / "test.txt", "w") as fte:
        for u in range(40):
            items = rng.choice(60, size=8, replace=False)
            ftr.write(f"{u} " + " ".join(map(str, items[:6])) + "\n")
            fte.write(f"{u} " + " ".join(map(str, items[6:])) + "\n")
    args = [
        "--model", "mf", "--recdim", "8", "--bpr_batch", "64", "--lr", "0.05",
        "--test_span", "1", "--data_path", str(tmp_path),
        "--path", str(tmp_path / "ckpt"), "--test",
    ]
    main(args + ["--epochs", "2"])
    main(args + ["--epochs", "4", "--load", "1"])
    out = capsys.readouterr().out
    assert "warm-started" in out
