"""Unified CLI: ``python -m consolver_tpu <command> [args...]``.

One front door over the ``scripts/`` entrypoints (the reference drives
everything through per-task bash scripts — run_ppo.sh, gen.sh,
compute_reward.sh; docs/MIGRATION.md maps each workflow).  Every command
forwards argv verbatim to the corresponding script's ``main()``:

  train-sd        PPO-train the SD-1.5 consistency solver (scripts/train_sd15.py)
  train-flux      PPO-train the FLUX-Kontext edit solver (scripts/train_flux.py)
  generate        text-to-image sweeps over the solver zoo (scripts/generate.py)
  generate-edit   kontext-bench edit generation (scripts/generate_edit.py)
  generate-teacher  teacher trajectory sets, both families (scripts/generate_teacher.py)
  evaluate        consistency / fid / edit-score metrics (scripts/evaluate.py)
  serve           HTTP serving, t2i + edit engines (scripts/serve.py)
  convert         HF hub -> orbax checkpoint conversion (scripts/convert_checkpoints.py)
  quantize        int8/int4 serving checkpoints (scripts/quantize_checkpoint.py)
  preview         preview/refine product demo (scripts/preview_demo.py)
  selftest        end-to-end eval-chain selftest (scripts/selftest_eval.py)

``python -m consolver_tpu <command> --help`` shows the command's own flags.
"""

from __future__ import annotations

import importlib
import os
import sys

_COMMANDS = {
    "train-sd": "train_sd15",
    "train-flux": "train_flux",
    "generate": "generate",
    "generate-edit": "generate_edit",
    "generate-teacher": "generate_teacher",
    "evaluate": "evaluate",
    "serve": "serve",
    "convert": "convert_checkpoints",
    "quantize": "quantize_checkpoint",
    "preview": "preview_demo",
    "selftest": "selftest_eval",
}


def _usage() -> str:
    lines = ["usage: python -m consolver_tpu <command> [args...]", "", "commands:"]
    lines += [f"  {name}" for name in _COMMANDS]
    lines.append("")
    lines.append("run `python -m consolver_tpu <command> --help` for per-command flags")
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(_usage())
        return 0
    cmd = argv[0]
    if cmd not in _COMMANDS:
        print(f"unknown command: {cmd!r}\n\n{_usage()}", file=sys.stderr)
        return 2

    # scripts/ sits next to the package root, not inside it
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo_root not in sys.path:
        sys.path.insert(0, repo_root)
    module = importlib.import_module(f"scripts.{_COMMANDS[cmd]}")

    old_argv = sys.argv
    sys.argv = [f"consolver_tpu {cmd}"] + argv[1:]
    try:
        module.main()
    finally:
        sys.argv = old_argv
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
