"""Command-line entry point: ``python -m pinn <cmd> ...`` (or the
``pinn`` console script once the package is installed).

The reference's entire CLI surface is ``python <experiment>.py
[hp.json]`` (SURVEY.md §3.4, reference 1d-burgers/inf_cont_burgers.py
:23-27 — hp comes from a JSON file given as argv[1] or inline
defaults).  This module keeps that contract reachable from one
installed entry point and adds the surrounding framework drives:

    pinn info                          # backend / device / version report
    pinn run <experiment> [hp.json] [--set k=v ...] [--plot] [--list]
    pinn campaign [names...] [--verify] [--quick] [--f32]
    pinn bench [bench.py args...]

``run``/``campaign``/``bench`` need the repo checkout (experiment
scripts are deliberately *scripts*, mirroring the reference layout, not
package modules); the CLI locates it via $PINN_EXPERIMENTS, the current
directory, or the installed package's parent, in that order.
"""

from __future__ import annotations

import importlib
import json
import os
import sys
from typing import Optional


def _repo_dirs():
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return [os.environ.get("PINN_EXPERIMENTS"),
            os.path.join(os.getcwd(), "experiments"),
            os.path.join(pkg_parent, "experiments")]


def _experiments_dir() -> str:
    for cand in _repo_dirs():
        if cand and os.path.isdir(cand):
            return os.path.abspath(cand)
    raise SystemExit("pinn: experiments/ directory not found — run from "
                     "the repo checkout or set $PINN_EXPERIMENTS")


def _list_experiments(exp_dir: str):
    names = []
    for fn in sorted(os.listdir(exp_dir)):
        if fn.endswith(".py") and not fn.startswith("_"):
            mod_src = open(os.path.join(exp_dir, fn)).read()
            if "\nDEFAULT_HP" in mod_src and "\ndef run(" in mod_src:
                names.append(fn[:-3])
    return names


def _parse_set(pairs):
    """--set key=value overrides; values parse as JSON when possible
    (numbers, lists, booleans), else stay strings."""
    out = {}
    for kv in pairs:
        key, sep, val = kv.partition("=")
        if not sep:
            raise SystemExit(f"pinn: --set expects key=value, got {kv!r}")
        try:
            out[key] = json.loads(val)
        except json.JSONDecodeError:
            out[key] = val
    return out


def _cmd_info() -> int:
    import jax
    import pinn
    print(f"pinn {getattr(pinn, '__version__', '0.1.0')}")
    print(f"jax {jax.__version__}  backend={jax.default_backend()}")
    for d in jax.devices():
        print(f"  {d}")
    return 0


def _cmd_run(argv) -> int:
    exp_dir = _experiments_dir()
    if "--list" in argv:
        print("\n".join(_list_experiments(exp_dir)))
        return 0
    plot = "--plot" in argv
    sets, rest, it = [], [], iter([a for a in argv if a != "--plot"])
    for a in it:
        if a == "--set":
            sets.append(next(it, ""))
        elif a.startswith("--set="):
            sets.append(a[len("--set="):])
        else:
            rest.append(a)
    if not rest:
        raise SystemExit("pinn run: experiment name required "
                         "(see `pinn run --list`)")
    name, hp_path = rest[0], (rest[1] if len(rest) > 1 else None)
    if exp_dir not in sys.path:
        sys.path.insert(0, exp_dir)
    try:
        mod = importlib.import_module(name)
    except ImportError as e:
        raise SystemExit(f"pinn run: cannot import experiment {name!r} "
                         f"from {exp_dir}: {e}")
    hp = dict(getattr(mod, "DEFAULT_HP", {}))
    if hp_path:
        with open(hp_path) as f:
            hp.update(json.load(f))
    hp.update(_parse_set(sets))
    result = mod.run(hp, plot=plot)
    if isinstance(result, dict) and "error" in result:
        print(f"rel-L2 error: {result['error']:.4e}")
    return 0


def _run_script(path: str, argv) -> int:
    """Execute a repo-root script under its own __main__ contract."""
    import runpy
    old = sys.argv
    sys.argv = [path] + list(argv)
    try:
        runpy.run_path(path, run_name="__main__")
        return 0
    except SystemExit as e:
        return int(e.code or 0)
    finally:
        sys.argv = old


def _cmd_campaign(argv) -> int:
    exp_dir = _experiments_dir()
    return _run_script(os.path.join(exp_dir, "run_campaign.py"), argv)


def _cmd_bench(argv) -> int:
    repo = os.path.dirname(_experiments_dir())
    bench = os.path.join(repo, "bench.py")
    if not os.path.exists(bench):
        raise SystemExit(f"pinn bench: {bench} not found")
    return _run_script(bench, argv)


def main(argv: Optional[list] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__.split("\n\n")[1])
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "info":
        return _cmd_info()
    if cmd == "run":
        return _cmd_run(rest)
    if cmd == "campaign":
        return _cmd_campaign(rest)
    if cmd == "bench":
        return _cmd_bench(rest)
    raise SystemExit(f"pinn: unknown command {cmd!r} "
                     "(expected info | run | campaign | bench)")


if __name__ == "__main__":
    sys.exit(main())
