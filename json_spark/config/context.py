"""Per-context configs — the reference's LAST declared-only TODO
(dirtytypes.go:85, getConfig(ctx), issue 6), implemented the Spark way.

In the reference every dirty decode calls ``getConfig(ctx)``, which today
ignores the context and returns the global config; issue 6 is "resolve
the config FROM the context instead". In this engine, rule configs are
driver-side literals that Catalyst constant-folds into the plan, so the
"context" is simply the driver code building the plan — a scoped config
stack gives exactly the per-context behavior the reference sketches:

    with scoped_config(my_cfg):
        res = coerce_number(col)        # cfg=None -> current_config()

Nesting works (innermost wins), exceptions unwind cleanly, and every
``coerce_*`` accepts an explicit ``cfg=`` that outranks the stack — the
same precedence as passing a non-nil config past a ctx in Go. The stack
is thread-local: concurrent driver threads building plans (e.g. parallel
query submission in tests or a multi-tenant notebook) cannot leak a
scope into each other. Executors never see any of this — by the time a
plan ships, the config has been folded into Column literals.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from .rules import RuleConfig, default_config

_local = threading.local()


def _stack() -> list[RuleConfig]:
    if not hasattr(_local, "stack"):
        _local.stack = []
    return _local.stack


def current_config() -> RuleConfig:
    """The innermost scoped config, else the global default — the
    engine's ``getConfig(ctx)``."""
    st = _stack()
    return st[-1] if st else default_config()


@contextmanager
def scoped_config(cfg: RuleConfig):
    """Make ``cfg`` the ambient config for plan-building inside the
    ``with`` block (this thread only)."""
    st = _stack()
    st.append(cfg)
    try:
        yield cfg
    finally:
        st.pop()
