"""Retry/timeout hardening for first-compile paths (ROADMAP #12).

Compiling through the TPU relay occasionally stalls for minutes, and full
tunnel outages have been observed (rounds 2-3).  A stalled compile blocks
the calling thread indefinitely and cannot be cancelled in-process, so
the hardening runs the compile in a CHILD process with a deadline:

* the child executes ``jax.jit(fn).lower(*args).compile()`` with the
  persistent compilation cache enabled (utils/cache.py), so everything a
  successful child compiled is instantly reusable by the parent;
* on deadline the child is killed BY PID (never by pattern) and the
  compile is retried — a transient relay stall rarely repeats, and
  partial per-module cache entries from the failed attempt still help;
* after the child reports success the parent's own jit call hits the
  warm cache and completes in seconds.

Two hard-won rules shape the child handoff (observed during a live
relay outage, round 3):

1. **The work order travels through a temp FILE, not Process args.**
   ``multiprocessing`` ships pickled Process args through a pipe inside
   ``p.start()``; with a megabyte-scale payload (a template bank) the
   parent blocks in that write until the child reads — and a child that
   dies during startup leaves the parent deadlocked BEFORE the deadline
   poll, unkillable by its own hardening.  A file write never depends
   on the child.
2. **The child re-asserts the parent's jax platform before touching any
   jax value, and hard-exits when done.**  A fresh interpreter re-runs
   ``sitecustomize``, which re-pins the relay TPU plugin regardless of
   the inherited ``JAX_PLATFORMS`` (observed: a CPU-mesh test's child
   initialized the axon platform and hung on the dead relay).  And
   plugin service threads are non-daemon: without ``os._exit`` a child
   that finished its work can linger forever in interpreter teardown.

Use for CI/driver entry points where a multi-minute silent hang is worse
than a retried compile: ``warm_compile(fn, args, static_argnames=...)``.

Single-threaded child-process orchestration only — the TPU program
itself is unaffected.
"""

from __future__ import annotations

import multiprocessing
import os
import pickle
import tempfile
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


def _parent_platform() -> str:
    """The platform children must run on, WITHOUT initializing a backend.

    ``jax.default_backend()`` would dial the relay from the parent —
    exactly the hang this module guards against.  The config value (set
    by conftest / callers via ``jax.config.update``) wins over the env
    var; empty string means "leave the child's default alone".
    """
    import jax

    return (getattr(jax.config, "jax_platforms", None)
            or os.environ.get("JAX_PLATFORMS", "") or "")


def _dump_payload(payload) -> str:
    """Pickle the work order to a temp file; returns the path."""
    f = tempfile.NamedTemporaryFile(prefix="dsp_tpu_relay_", suffix=".pkl",
                                    delete=False)
    with f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return f.name


def _child_setup(platform: str):
    """Pin the platform + compilation cache BEFORE any jax value exists."""
    if platform:
        os.environ["JAX_PLATFORMS"] = platform
        import jax

        jax.config.update("jax_platforms", platform)
    from dsp_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()


def _child_compile(path, platform, conn):
    try:
        _child_setup(platform)
        with open(path, "rb") as f:
            fn, args, kwargs, static_argnames = pickle.load(f)
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
    finally:
        # bypass interpreter teardown: plugin service threads are
        # non-daemon and can hang a finished child forever (module
        # docstring rule 2).  send() already wrote the result bytes.
        os._exit(0)


def _child_run(path, platform, conn):
    try:
        _child_setup(platform)
        with open(path, "rb") as f:
            fn, args, kwargs = pickle.load(f)
        result = _resolve(fn)(*args, **kwargs)
        conn.send(("ok", result))
    except Exception as e:                      # pragma: no cover - relay only
        try:
            conn.send(("error", repr(e)))
        except Exception:
            pass
    finally:
        os._exit(0)


def _attempt_loop(target, payload, timeout_s: float, retries: int,
                  what: str):
    """Shared parent loop: spawn, poll with deadline, PID-kill, retry.

    Returns the child's (status, detail) tuple; raises CompileTimeout
    when every attempt stalls.  The payload file is deleted on exit.
    """
    log = get_logger()
    # 'spawn', not 'fork': the parent's XLA runtime owns thread pools
    # that do not survive fork, and a fresh interpreter is exactly the
    # semantics a relay retry wants.
    ctx = multiprocessing.get_context("spawn")
    platform = _parent_platform()
    path = _dump_payload(payload)
    try:
        last = "unknown"
        for attempt in range(1 + retries):
            parent_conn, child_conn = ctx.Pipe(duplex=False)
            p = ctx.Process(target=target, args=(path, platform, child_conn))
            p.start()
            child_conn.close()
            if parent_conn.poll(timeout_s):
                try:
                    status, detail = parent_conn.recv()
                except (EOFError, pickle.UnpicklingError):
                    status, detail = "error", "child died"
                p.join(30)
                if p.is_alive():
                    p.kill()
                    p.join()
                if status == "ok" and attempt:
                    log.info("%s succeeded on retry %d", what, attempt)
                return status, detail
            last = f"attempt {attempt + 1} stalled past {timeout_s:.0f}s"
            log.warning("%s; killing child pid %d and retrying", last, p.pid)
            p.kill()                             # PID-targeted, by handle
            p.join()
        raise CompileTimeout(
            f"{what} stalled through the relay: {last} "
            f"({1 + retries} attempts, timeout {timeout_s:.0f}s each)")
    finally:
        try:
            os.unlink(path)
        except OSError:
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
    status, detail = _attempt_loop(
        _child_compile,
        (fn, args, kwargs or {}, tuple(static_argnames)),
        timeout_s, retries, "compile")
    if status == "ok":
        return True
    get_logger().warning("compile child errored (%s); letting the parent "
                         "call surface it", detail)
    return False


def run_with_deadline(fn: Callable | str, args: tuple = (),
                      kwargs: dict | None = None,
                      timeout_s: float = 600.0, retries: int = 2) -> Any:
    """Run ``fn(*args, **kwargs)`` in a child process under a deadline.

    The heavyweight variant of ``warm_compile`` for whole entry points
    (e.g. a CLI evaluation): the child does the real work — first
    compiles land in the persistent cache, so a retry after a relay
    stall resumes warm — and its (picklable) return value is shipped
    back through a pipe.  ``fn`` must be picklable: a module-level
    callable, a bound method of a picklable object, or a "module:attr"
    string.  Raises CompileTimeout when every attempt exceeds
    ``timeout_s``; re-raises child errors as RuntimeError.
    """
    status, payload = _attempt_loop(
        _child_run, (fn, args, kwargs or {}), timeout_s, retries, "run")
    if status == "ok":
        return payload
    raise RuntimeError(f"child run failed: {payload}")
