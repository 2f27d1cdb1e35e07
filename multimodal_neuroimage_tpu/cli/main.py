"""Phase-driven CLI (replaces reference main.py).

Usage mirrors the reference's entry point (reference main.py:24-332, 601-619):

    python -m multimodal_neuroimage_tpu.cli.main \
        --step 3 --dataset_name sMRI --target sex --exp_name myexp

``--step N`` selects the phase (1=2DBERT, 2=lowfreqBERT, 3=VIT, 4=test,
5=FuncStruct, 6=SwinFusion — PHASE_TASKS); per-phase hyperparameter defaults
come from the typed phase overlays (config.PHASE_DEFAULTS, replacing the
``_phaseN``-suffix convention resolved by reference utils.py:144-151).
Weight chaining across phases (reference utils.py:95-128 ``weight_loader``)
resolves the previous phase's best checkpoint automatically.

Experiment folders are stamped like the reference (utils.py:130,
main.py:345-350): <base>/experiments/<exp_name>_<target>_<datestamp>/.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import os
import pickle
from datetime import datetime
from typing import Optional

from multimodal_neuroimage_tpu.config import (Config, PHASE_TASKS,
                                              config_for_phase)


def datestamp() -> str:
    """Seoul-timezone run stamp (reference utils.py:130)."""
    try:
        from zoneinfo import ZoneInfo
        now = datetime.now(ZoneInfo("Asia/Seoul"))
    except Exception:
        now = datetime.now()
    return now.strftime("%Y%m%d_%H%M%S")


def build_parser() -> argparse.ArgumentParser:
    """Argparse schema over the Config dataclass: every Config field is a
    flag; booleans use explicit --flag / --no-flag pairs (replacing the
    reference's store_false traps — SURVEY §5.6)."""
    p = argparse.ArgumentParser("multimodal_neuroimage_tpu")
    for f in dataclasses.fields(Config):
        if f.name in ("phase_overrides",):
            continue
        name = f"--{f.name}"
        if f.type == "bool" or isinstance(f.default, bool):
            p.add_argument(name, dest=f.name, default=f.default,
                           action=argparse.BooleanOptionalAction)
        elif f.default is None or isinstance(f.default, tuple):
            p.add_argument(name, default=f.default, type=str)
        else:
            p.add_argument(name, default=f.default, type=type(f.default))
    return p


def _parse_tuple(v):
    if isinstance(v, str):
        return tuple(int(x) for x in v.replace(",", " ").split())
    return v


def config_from_args(argv=None) -> Config:
    parser = build_parser()
    args = vars(parser.parse_args(argv))
    # flags the user explicitly set (differ from parser defaults) must beat
    # the per-phase default overlays
    user_set = {k for k, v in args.items() if v != parser.get_default(k)}
    for key in list(args):
        if key.startswith("fusion_") and key.endswith(("depths", "heads")):
            args[key] = _parse_tuple(args[key])
    for key in ("mesh_shape",):
        if isinstance(args.get(key), str):
            args[key] = _parse_tuple(args[key])
    if isinstance(args.get("lr_warmup"), str):
        args["lr_warmup"] = int(args["lr_warmup"])
    base = Config(**args)
    return config_for_phase(base, base.step, user_set=user_set)


def setup_experiment_folder(cfg: Config) -> Config:
    """<base>/experiments/<exp_name>_<target>_<stamp>/ (main.py:334, 345-350)."""
    if cfg.experiment_folder:
        return cfg
    title = f"{cfg.exp_name}_{cfg.target}"
    folder = os.path.join(cfg.base_path, "experiments",
                          f"{title}_{datestamp()}")
    os.makedirs(folder, exist_ok=True)
    return dataclasses.replace(cfg, experiment_folder=folder,
                               experiment_title=title)


def args_logger(cfg: Config) -> None:
    """Archive the resolved config as pkl + txt (reference utils.py:153-166)."""
    folder = cfg.experiment_folder
    with open(os.path.join(folder, "argument_documentation.txt"), "w") as f:
        for k, v in sorted(dataclasses.asdict(cfg).items()):
            f.write(f"{k}: {v}\n")
    with open(os.path.join(folder, "arguments.pkl"), "wb") as f:
        pickle.dump(dataclasses.asdict(cfg), f)


def _experiment_meta(folder: str) -> Optional[dict]:
    """Read the arguments.pkl archived by args_logger — identifies which
    task/target/exp_name an experiment folder belongs to."""
    try:
        with open(os.path.join(folder, "arguments.pkl"), "rb") as f:
            return pickle.load(f)
    except Exception:
        return None


def weight_loader(cfg: Config) -> Optional[str]:
    """Chain weights from the previous phase's best checkpoint
    (reference utils.py:95-128): step N maps to the task of the phase it
    chains from (2<-1 2DBERT, 4<-3, 5<-3, 6<-3 all VIT — reference loads
    ``model_weights_path_phase3`` for steps 4/5), then picks the newest BEST
    checkpoint among experiment folders matching that task AND this run's
    target, preferring the same experiment title (exp_name)."""
    if cfg.model_weights_path:
        return cfg.model_weights_path
    chain_from = {2: 1, 4: 3, 5: 3, 6: 3}.get(cfg.step)
    if chain_from is None:
        return None
    return _best_checkpoint_for(PHASE_TASKS[chain_from], cfg)


def _best_checkpoint_for(want_task: str, cfg: Config,
                         best_only: bool = True) -> Optional[str]:
    """Newest BEST checkpoint among experiment folders whose archived
    arguments match ``want_task``, preferring this run's target, then its
    experiment title. ``best_only=False`` (serving) also accepts folders
    with only a rolling ``*_last_epoch.ckpt`` — a BEST-bearing folder
    always outranks them."""
    # (same_target, same_title, has_best, mtime, path) — sorted ascending,
    # last wins: a same-target candidate always beats a cross-target one
    # (decoy experiments for other targets lose), but a task-matched
    # checkpoint trained on a different target is still usable for transfer
    # (the reference keys only by explicit phase path, utils.py:95-128) —
    # fall back to it with a warning rather than silently training from
    # scratch.
    candidates = []
    for folder in glob.glob(os.path.join(cfg.base_path, "experiments", "*")):
        meta = _experiment_meta(folder)
        if not meta or meta.get("task") != want_task:
            continue
        ckpts = glob.glob(os.path.join(folder, "*BEST*.ckpt"))
        has_best = bool(ckpts)
        if not ckpts and not best_only:
            ckpts = glob.glob(os.path.join(folder, "*.ckpt"))
        if not ckpts:
            continue
        best = max(ckpts, key=os.path.getmtime)
        candidates.append((meta.get("target") == cfg.target,
                           meta.get("exp_name") == cfg.exp_name,
                           has_best, os.path.getmtime(best), best))
    if not candidates:
        return None
    same_target, _, has_best, _, path = sorted(candidates)[-1]
    if not same_target:
        if cfg.strict_chaining:
            listing = "\n  ".join(
                f"{'same' if st else 'CROSS'}-target "
                f"{'BEST' if hb else 'last-epoch'}: {p}"
                for st, _, hb, _, p in sorted(candidates, reverse=True))
            raise FileNotFoundError(
                f"--strict_chaining: no '{want_task}' checkpoint trained on "
                f"target '{cfg.target}' found; only cross-target candidates "
                f"exist (check --target for typos, or drop --strict_chaining "
                f"to transfer cross-target):\n  {listing}")
        print(f"[weight_loader] no {want_task} checkpoint for target "
              f"'{cfg.target}'; chaining cross-target from {path}")
    if not has_best:
        print(f"[weight_loader] WARNING: no BEST checkpoint for task "
              f"'{want_task}'; using {os.path.basename(path)} (likely "
              f"last-epoch weights, not validation-selected)")
    return path


def run_phase(cfg: Config) -> dict:
    """Experiment driver (reference main.py:340-535)."""
    from multimodal_neuroimage_tpu.train.trainer import Trainer
    cfg = setup_experiment_folder(cfg)
    args_logger(cfg)
    weights = weight_loader(cfg)
    if weights and not cfg.model_weights_path:
        cfg = dataclasses.replace(cfg, model_weights_path=weights)

    if cfg.use_optuna:
        from multimodal_neuroimage_tpu.hpo.optuna_harness import run_study
        return run_study(cfg)

    if cfg.use_best_params_from_optuna:
        # reload the finished study's best params into this full run
        # (reference main.py:501-522)
        from multimodal_neuroimage_tpu.hpo.optuna_harness import \
            apply_best_params
        cfg = apply_best_params(cfg)

    if cfg.predict_only:
        from multimodal_neuroimage_tpu.serve.predictor import run_predict
        # resolve the checkpoint BEFORE handing off: with a default
        # (freshly minted, empty) experiment folder there is nothing to
        # serve from — find the newest same-task (preferably same-target)
        # BEST checkpoint across past experiments instead. predictions.csv
        # still lands in THIS run's folder; the source run's arguments.pkl
        # is never touched.
        from multimodal_neuroimage_tpu.ckpt.checkpoint import \
            latest_checkpoint
        if not cfg.model_weights_path and not latest_checkpoint(
                cfg.experiment_folder):
            found = _best_checkpoint_for(cfg.task, cfg, best_only=False)
            if found is None:
                raise FileNotFoundError(
                    f"--predict_only: no checkpoint in "
                    f"{cfg.experiment_folder!r} and no previous "
                    f"'{cfg.task}' experiment with a BEST checkpoint under "
                    f"{os.path.join(cfg.base_path, 'experiments')!r}; pass "
                    f"--model_weights_path or --experiment_folder")
            print(f"[predict] serving checkpoint {found}")
            cfg = dataclasses.replace(cfg, model_weights_path=found)
        return run_predict(cfg)

    if cfg.task == "test" or cfg.step == 4:
        trainer = Trainer(cfg, sets=["test"])
        return trainer.testing()
    trainer = Trainer(cfg, sets=["train", "val"])
    return trainer.training()


def main(argv=None) -> None:
    cfg = config_from_args(argv)
    metrics = run_phase(cfg)
    print("final metrics:", metrics)


if __name__ == "__main__":
    main()
