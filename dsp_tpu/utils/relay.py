"""Retry/timeout hardening for first-compile paths (ROADMAP #12).

Compiling through the TPU relay occasionally stalls for minutes, and one
full tunnel outage was observed in round 2.  A stalled compile blocks the
calling thread indefinitely and cannot be cancelled in-process, so the
hardening runs the compile in a CHILD process with a deadline:

* the child executes ``jax.jit(fn).lower(*args).compile()`` with the
  persistent compilation cache enabled (utils/cache.py), so everything a
  successful child compiled is instantly reusable by the parent;
* on deadline the child is killed BY PID (never by pattern) and the
  compile is retried — a transient relay stall rarely repeats, and
  partial per-module cache entries from the failed attempt still help;
* after the child reports success the parent's own jit call hits the
  warm cache and completes in seconds.

Use for CI/driver entry points where a multi-minute silent hang is worse
than a retried compile: ``warm_compile(fn, args, static_argnames=...)``.

Single-threaded child-process orchestration only — the TPU program
itself is unaffected.
"""

from __future__ import annotations

import multiprocessing
import os
import pickle
from typing import Any, Callable, Iterable

from dsp_tpu.utils.logging import get_logger


class CompileTimeout(RuntimeError):
    """All compile attempts hit the deadline (relay stalled/down)."""


def _resolve(fn):
    """'module:attr' -> the attribute; callables pass through.

    The string form lets a child warm an ALREADY-jitted module-level
    entry point (e.g. "dsp_tpu.pipeline:recognize_batch") — importing it
    fresh guarantees the identical program/cache key the parent will
    execute, and sidesteps pickling jit wrappers under spawn.
    """
    if isinstance(fn, str):
        mod, _, attr = fn.partition(":")
        import importlib

        return getattr(importlib.import_module(mod), attr)
    return fn


def _child_compile(fn, args, kwargs, static_argnames, conn):
    try:
        from dsp_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        import jax

        fn = _resolve(fn)
        if hasattr(fn, "lower"):               # already jit-wrapped
            jitted = fn
        elif static_argnames:
            jitted = jax.jit(fn, static_argnames=tuple(static_argnames))
        else:
            jitted = jax.jit(fn)
        jitted.lower(*args, **kwargs).compile()
        conn.send(("ok", None))
    except Exception as e:                      # pragma: no cover - relay only
        try:
            conn.send(("error", repr(e)))
        except Exception:
            pass


def warm_compile(fn: Callable | str, args: tuple,
                 kwargs: dict | None = None,
                 static_argnames: Iterable[str] = (),
                 timeout_s: float = 300.0, retries: int = 2) -> bool:
    """Compile ``jax.jit(fn)`` for ``args`` with a deadline + retries.

    ``fn`` may be a callable (plain fns are jitted; jit-wrapped fns are
    lowered as-is) or a ``"module:attr"`` string resolved in the child.

    Returns True once a child process finished the compile (the parent's
    next jit call is then a cache hit), False if compilation errored in
    the child (the parent call will surface the real exception).  Raises
    CompileTimeout when every attempt stalled past ``timeout_s``.

    The child is always killed by its PID — never by process-name
    pattern — and is joined before the next attempt.
    """
    kwargs = kwargs or {}
    log = get_logger()
    # 'spawn', not 'fork': the parent's XLA runtime owns thread pools
    # that do not survive fork, and a fresh interpreter is exactly the
    # semantics a relay retry wants.  fn and args must be picklable
    # (module-level fn; jax arrays/configs pickle fine).
    ctx = multiprocessing.get_context("spawn")
    last = "unknown"
    for attempt in range(1 + retries):
        parent_conn, child_conn = ctx.Pipe(duplex=False)
        p = ctx.Process(target=_child_compile,
                        args=(fn, args, kwargs, tuple(static_argnames),
                              child_conn))
        p.start()
        child_conn.close()
        ok = parent_conn.poll(timeout_s)
        if ok:
            try:
                status, detail = parent_conn.recv()
            except (EOFError, pickle.UnpicklingError):
                status, detail = "error", "child died"
            p.join(30)
            if p.is_alive():
                p.kill()
                p.join()
            if status == "ok":
                if attempt:
                    log.info("compile succeeded on retry %d", attempt)
                return True
            log.warning("compile child errored (%s); letting the parent "
                        "call surface it", detail)
            return False
        last = f"attempt {attempt + 1} stalled past {timeout_s:.0f}s"
        log.warning("%s; killing child pid %d and retrying", last, p.pid)
        p.kill()                                 # PID-targeted, by handle
        p.join()
    raise CompileTimeout(
        f"compile stalled through the relay: {last} "
        f"({1 + retries} attempts, timeout {timeout_s:.0f}s each)")


def _child_run(fn, args, kwargs, conn):
    try:
        from dsp_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        result = _resolve(fn)(*args, **kwargs)
        conn.send(("ok", result))
    except Exception as e:                      # pragma: no cover - relay only
        try:
            conn.send(("error", repr(e)))
        except Exception:
            pass


def run_with_deadline(fn: Callable | str, args: tuple = (),
                      kwargs: dict | None = None,
                      timeout_s: float = 600.0, retries: int = 2) -> Any:
    """Run ``fn(*args, **kwargs)`` in a child process under a deadline.

    The heavyweight variant of ``warm_compile`` for whole entry points
    (e.g. a CLI evaluation): the child does the real work — first
    compiles land in the persistent cache, so a retry after a relay
    stall resumes warm — and its (picklable) return value is shipped
    back through a pipe.  ``fn`` must be picklable under spawn: a
    module-level callable, a bound method of a picklable object, or a
    "module:attr" string.  Raises CompileTimeout when every attempt
    exceeds ``timeout_s``; re-raises child errors as RuntimeError.
    """
    kwargs = kwargs or {}
    log = get_logger()
    ctx = multiprocessing.get_context("spawn")
    last = "unknown"
    for attempt in range(1 + retries):
        parent_conn, child_conn = ctx.Pipe(duplex=False)
        p = ctx.Process(target=_child_run, args=(fn, args, kwargs, child_conn))
        p.start()
        child_conn.close()
        if parent_conn.poll(timeout_s):
            try:
                status, payload = parent_conn.recv()
            except (EOFError, pickle.UnpicklingError):
                status, payload = "error", "child died"
            p.join(30)
            if p.is_alive():
                p.kill()
                p.join()
            if status == "ok":
                if attempt:
                    log.info("run succeeded on retry %d", attempt)
                return payload
            raise RuntimeError(f"child run failed: {payload}")
        last = f"attempt {attempt + 1} stalled past {timeout_s:.0f}s"
        log.warning("%s; killing child pid %d and retrying", last, p.pid)
        p.kill()                                 # PID-targeted, by handle
        p.join()
    raise CompileTimeout(
        f"run stalled through the relay: {last} "
        f"({1 + retries} attempts, timeout {timeout_s:.0f}s each)")
