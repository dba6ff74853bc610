"""CLI migration contract (MIGRATION.md): every live reference flag parses
under the same name with the same default, reference-style boolean values
parse, and the reference's dead flags are rejected rather than silently
swallowed (G-Meta/train.py:152-177)."""

import argparse
import dataclasses

import pytest

from gmeta_tpu.config import PRESETS, Config
from gmeta_tpu.run import train as train_mod


def _parse(argv):
    """Run main()'s argparse layer only: rebuild the parser the way main
    does (train.py:604-631) and return the resolved Config."""
    ap = argparse.ArgumentParser(allow_abbrev=False)
    ap.add_argument("--preset", choices=sorted(PRESETS), default=None)
    for f in dataclasses.fields(Config):
        if f.type in ("int", "float", "str"):
            ap.add_argument(f"--{f.name}",
                            type={"int": int, "float": float, "str": str}[f.type],
                            default=None)
        elif f.type == "bool":
            ap.add_argument(f"--{f.name}", type=lambda s: s == "True",
                            default=None)
    ap.add_argument("--mesh_tasks", type=int, default=0)
    ap.add_argument("--mesh_edges", type=int, default=0)
    args = ap.parse_args(argv)
    cfg = PRESETS[args.preset] if args.preset else Config()
    cfg = dataclasses.replace(cfg)
    for f in dataclasses.fields(Config):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    return cfg


# The reference's 22 argparse flags (train.py:152-177) minus the four dead
# ones dropped deliberately (MIGRATION.md "Flag-by-flag").
LIVE_REFERENCE_FLAGS = {
    "epoch": "7", "n_way": "5", "k_spt": "4", "k_qry": "12", "task_num": "16",
    "meta_lr": "0.002", "update_lr": "0.01", "update_step": "6",
    "update_step_test": "11", "input_dim": "64", "hidden_dim": "96",
    "data_dir": "/tmp/x", "task_setup": "Shared", "task_n": "2",
    "task_mode": "True", "train_result_report_steps": "40",
    "num_workers": "2", "batchsz": "500", "link_pred_mode": "True",
    "h": "3", "sample_nodes": "800",
}
DROPPED_DEAD_FLAGS = ["attention_size", "no_finetune", "method",
                      "val_result_report_steps"]


def test_every_live_reference_flag_parses_under_its_own_name():
    argv = []
    for k, v in LIVE_REFERENCE_FLAGS.items():
        argv += [f"--{k}", v]
    cfg = _parse(argv)
    assert cfg.epoch == 7 and cfg.n_way == 5 and cfg.k_spt == 4
    assert cfg.k_qry == 12 and cfg.task_num == 16
    assert cfg.meta_lr == 0.002 and cfg.update_lr == 0.01
    assert cfg.update_step == 6 and cfg.update_step_test == 11
    assert cfg.input_dim == 64 and cfg.hidden_dim == 96
    assert cfg.data_dir == "/tmp/x" and cfg.task_setup == "Shared"
    assert cfg.task_n == 2 and cfg.task_mode is True
    assert cfg.train_result_report_steps == 40 and cfg.num_workers == 2
    assert cfg.batchsz == 500 and cfg.link_pred_mode is True
    assert cfg.h == 3 and cfg.sample_nodes == 800


def test_reference_defaults_match():
    cfg = _parse([])
    ref_defaults = dict(epoch=10, n_way=3, k_spt=3, k_qry=24, task_num=8,
                        meta_lr=1e-3, update_lr=1e-3, update_step=5,
                        update_step_test=10, hidden_dim=64, task_setup="Disjoint",
                        task_n=1, task_mode=False, num_workers=0, batchsz=1000,
                        link_pred_mode=False, h=2, sample_nodes=1000,
                        train_result_report_steps=30)
    for k, v in ref_defaults.items():
        assert getattr(cfg, k) == v, (k, getattr(cfg, k), v)


def test_reference_style_boolean_strings_parse():
    assert _parse(["--task_mode", "True"]).task_mode is True
    assert _parse(["--task_mode", "False"]).task_mode is False
    assert _parse(["--device_task_pool", "True"]).device_task_pool is True


def test_dead_reference_flags_are_rejected_not_swallowed():
    for flag in DROPPED_DEAD_FLAGS:
        with pytest.raises(SystemExit):
            _parse([f"--{flag}", "1"])


def test_misspelled_link_pred_mod_rejected():
    # The reference README's `--link_pred_mod True` only worked via argparse
    # prefix matching; here it must fail loudly (MIGRATION.md).
    with pytest.raises(SystemExit):
        _parse(["--link_pred_mod", "True"])


def test_presets_resolve_and_override():
    cfg = _parse(["--preset", "arxiv", "--hidden_dim", "32"])
    assert cfg.hidden_dim == 32
    assert cfg.task_setup == "Disjoint"
    for name in PRESETS:
        _parse(["--preset", name]).validate()


def test_parser_layer_matches_production_main():
    # The helper above must stay in lockstep with run.train.main's parser:
    # main() with --help must advertise exactly the Config fields + preset
    # + mesh flags the helper rebuilds.
    import contextlib
    import io
    buf = io.StringIO()
    with pytest.raises(SystemExit), contextlib.redirect_stdout(buf):
        train_mod.main(["--help"])
    helptext = buf.getvalue()
    for f in dataclasses.fields(Config):
        assert f"--{f.name}" in helptext, f.name
    for extra in ("--preset", "--mesh_tasks", "--mesh_edges"):
        assert extra in helptext
    for flag in DROPPED_DEAD_FLAGS:
        assert f"--{flag}" not in helptext
