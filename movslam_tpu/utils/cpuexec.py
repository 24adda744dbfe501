"""Plugin-free CPU verification processes.

The image's sitecustomize loads the tunneled-TPU PJRT plugin
(libaxon_pjrt.so) into EVERY python process. With the plugin loaded,
some CPU-backend XLA executables execute INCORRECTLY on this host
(measured 2026-08: the windowed tracking program returned wrong
match/flag words under the plugin and bit-identical-correct results
without it — same code, same compile cache; the corruption is at run
time, not compile time). CPU test/verification runs must therefore not
have the plugin in-process.

The plugin registers at interpreter start (sitecustomize), before
conftest or any application code runs — the only reliable way to shed
it is to RE-EXEC the interpreter with the plugin's env trigger cleared.
`ensure_plugin_free_cpu()` does exactly that (idempotent, loop-guarded);
call it FIRST, before anything imports jax state that matters.
"""
from __future__ import annotations

import os
import sys

_GUARD = "MOVSLAM_PLUGIN_FREE"


def plugin_active() -> bool:
    return bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def ensure_plugin_free_cpu(argv=None):
    """Re-exec the current python process with the axon plugin disabled
    and the CPU backend selected. No-op when already plugin-free.

    argv: full replacement argv (defaults to `[python, -m, <module>] +
    sys.argv[1:]` when running `python -m ...`, else sys.argv verbatim).
    """
    if not plugin_active() or os.environ.get(_GUARD) == "1":
        return
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize trigger off
    env["JAX_PLATFORMS"] = "cpu"
    env[_GUARD] = "1"
    if argv is None:
        main_mod = sys.modules.get("__main__")
        spec = getattr(main_mod, "__spec__", None)
        if spec is not None and spec.name:
            # `python -m pkg` (e.g. python -m pytest tests/ -x -q)
            mod = spec.name
            if mod.endswith(".__main__"):
                mod = mod[: -len(".__main__")]
            argv = [sys.executable, "-m", mod] + sys.argv[1:]
        else:
            argv = [sys.executable] + sys.argv
    os.execve(sys.executable, argv, env)
