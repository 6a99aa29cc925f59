"""Persist winning compiled executables across processes (draw pinning).

Compile draws of one identical program spread ~0.89-1.03 ms in long-chain
truth on this backend (benchmarks/probe_draws.py; the XLA scheduler is
nondeterministic across compiles), and the backend's persistent compile
cache does NOT cover remote compiles — so every fresh ``bench.py`` process
re-rolls the dice. A production deployment would pin the good executable
once; this module makes the bench (and any other caller) do the same via
JAX's AOT executable serialization, which — measured here — round-trips the
full Mosaic/custom-call program bit-identically (same checksum, same
long-chain op time in a fresh process).

Cache entries are keyed by a workload descriptor hash that includes the
jax/jaxlib versions and the device kind, so stale executables from a
different toolchain or chip never load. Corrupt or incompatible entries are
deleted and reported; callers fall back to a fresh compile search.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import sys
from typing import Any, Callable, Dict, Optional, Tuple

__all__ = [
    "workload_key",
    "save_executable",
    "load_executable",
    "PinnedJit",
]


def workload_key(**fields) -> str:
    """Stable hash of (toolchain, device kind, caller-supplied workload
    fields). Two processes on the same chip + jax build + workload agree."""
    import jax

    dev = jax.devices()[0]
    desc = {
        "jax": jax.__version__,
        "jaxlib": getattr(
            __import__("jaxlib"), "__version__", "?"
        ),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "platform": getattr(dev, "platform", "?"),
        **fields,
    }
    blob = repr(sorted(desc.items())).encode()
    return hashlib.sha256(blob).hexdigest()[:20]


def _path(cache_dir: str, key: str) -> str:
    return os.path.join(cache_dir, f"exe_{key}.pkl")


def serialize_compiled(compiled) -> Optional[Dict[str, Any]]:
    """Serialize a ``jax.stages.Compiled`` to a picklable record, or None
    (with a stderr note).

    Serialize BEFORE the executable's first execution: executables whose
    programs contain sort comparators fail with ``UNIMPLEMENTED:
    `LessThan` is not serializable`` once they have run (measured on this
    jax build; the draw search therefore captures each candidate's
    payload before timing it).
    """
    try:
        import jax
        from jax.experimental.serialize_executable import serialize

        payload, in_tree, out_tree = serialize(compiled)
        # record how many devices the executable was built for, so the
        # loading process binds that many (a load under MORE local devices
        # — e.g. the 8-device virtual-CPU test mesh — would otherwise bind
        # all of them and demand 8-way-sharded arguments)
        try:
            n_dev = len(compiled.runtime_executable().local_devices())
        except Exception:  # noqa: BLE001
            n_dev = 1
        rec: Dict[str, Any] = {
            "payload": payload,
            "in_tree": in_tree,
            "out_tree": out_tree,
            "n_dev": n_dev,
        }
        # Multi-PROCESS executables (a multi-host device assignment) must
        # re-bind devices by GLOBAL ID at load — positional local-prefix
        # binding cannot represent the assignment. The serializer records
        # devices by id, so a load that passes the full global device list
        # reconstructs the exact assignment (proven: two-process CPU mesh,
        # warm-started both processes, bit-identical output). Each process
        # saves/loads its OWN record (the PinnedJit key carries the
        # process index), so there are no cross-process cache races.
        if getattr(jax, "process_count", lambda: 1)() > 1:
            rec["bind"] = "global"
            rec["proc_count"] = jax.process_count()
            rec["proc_index"] = jax.process_index()
        return rec
    except Exception as e:  # noqa: BLE001 — report and move on
        print(f"exe_cache: serialize failed ({type(e).__name__}: {e})",
              file=sys.stderr)
        return None


def write_record(
    cache_dir: str, key: str, record: Dict[str, Any], meta: Dict[str, Any]
) -> Optional[str]:
    """Write a :func:`serialize_compiled` record + meta atomically."""
    try:
        os.makedirs(cache_dir, exist_ok=True)
        path = _path(cache_dir, key)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump({**record, "meta": dict(meta)}, f)
        os.replace(tmp, path)  # atomic vs concurrent readers
        return path
    except Exception as e:  # noqa: BLE001
        print(f"exe_cache: save failed ({type(e).__name__}: {e})",
              file=sys.stderr)
        return None


def save_executable(
    cache_dir: str, key: str, compiled, meta: Dict[str, Any]
) -> Optional[str]:
    """Serialize ``compiled`` + ``meta`` to the cache. Returns the path,
    or None (with a stderr note) on failure — saving is best-effort,
    never fatal to the caller. See :func:`serialize_compiled` for the
    serialize-before-execution requirement."""
    record = serialize_compiled(compiled)
    if record is None:
        return None
    return write_record(cache_dir, key, record, meta)


def load_executable(
    cache_dir: str, key: str, devices=None
) -> Optional[Tuple[Callable, Dict[str, Any]]]:
    """Deserialize a cached executable. Returns ``(callable, meta)`` or
    None. A corrupt/incompatible entry is deleted so the next run doesn't
    re-trip on it; the caller verifies numerics (meta checksum) itself.

    ``devices`` overrides the execution-device binding (default
    ``jax.devices()``) — sharded executables must be re-bound to the SAME
    device order the compiling mesh used (pass ``mesh.devices.flat``), or
    the loaded program's input shardings map to the wrong chips.

    Records saved under a multi-process job (``bind == 'global'``) are
    re-bound by global device ID over the full ``jax.devices()`` list
    instead of a local positional prefix — the process count must match
    the saving job's."""
    path = _path(cache_dir, key)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            d = pickle.load(f)
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
        )

        import jax

        if d.get("bind") == "global":
            pc = getattr(jax, "process_count", lambda: 1)()
            if pc != int(d.get("proc_count", 1)):
                raise ValueError(
                    f"multi-process executable saved under "
                    f"{d.get('proc_count')} processes, have {pc}"
                )
            # full global list: the unpickler maps the executable's
            # device assignment by id, so order is immaterial and extra
            # entries are harmless
            devs = list(devices) if devices is not None else jax.devices()
            loaded = deserialize_and_load(
                d["payload"], d["in_tree"], d["out_tree"],
                execution_devices=devs,
            )
            return loaded, d.get("meta", {})
        n_dev = int(d.get("n_dev", 1))
        devs = list(devices) if devices is not None else jax.devices()
        if n_dev > len(devs):
            raise ValueError(
                f"executable needs {n_dev} devices, have {len(devs)}"
            )
        loaded = deserialize_and_load(
            d["payload"], d["in_tree"], d["out_tree"],
            execution_devices=devs[:n_dev],
        )
        return loaded, d.get("meta", {})
    except Exception as e:  # noqa: BLE001
        print(
            f"exe_cache: load failed ({type(e).__name__}: {e}); "
            f"removing {path}",
            file=sys.stderr,
        )
        try:
            os.remove(path)
        except OSError:
            pass
        return None


class PinnedJit:
    """``jax.jit`` with the compiled executable persisted across processes.

    On the first call per argument signature the function is TRACED and
    LOWERED (cheap — seconds), the lowered HLO text is hashed, and the
    cache is consulted: a hit deserializes the previously compiled
    executable (~10 ms) instead of invoking the XLA compiler (minutes per
    program through this backend's remote-compile path, and draw-unstable
    — see module docstring). A miss compiles once and persists.

    Keying on the HLO hash makes reuse safe by construction: a different
    model configuration, input shape, dtype, or code version lowers to
    different HLO and therefore a different key — there is no way to load
    a semantically stale executable. ``cache_dir=None`` degrades to plain
    ``jax.jit``.

    Serving cold-start is the motivating use (rgcn_tpu/serve.py): a server
    restart re-traces but no longer re-compiles its encoder and per-bucket
    ranking programs.
    """

    def __init__(self, fn, cache_dir: Optional[str], tag: str = "",
                 search: int = 0, search_runner: Optional[Callable] = None,
                 devices=None, **jit_kwargs):
        import jax

        # jit_kwargs (e.g. donate_argnums) are part of the lowering, so
        # the serialized executable preserves them (buffer aliasing incl.).
        # ``devices`` binds loaded executables to an explicit device order
        # (sharded programs: pass the compiling mesh's ``devices.flat``).
        self._jit = jax.jit(fn, **jit_kwargs)
        self._devices = list(devices) if devices is not None else None
        self._cache_dir = cache_dir
        self._tag = tag
        # Draw search: on a cache miss, compile ``search`` times and pin
        # the executable ``search_runner(compiled, args) -> seconds``
        # measures fastest. XLA's scheduler is nondeterministic across
        # compiles — identical HLO spreads ~2x long-chain truth at AM
        # scale on this backend (STATUS round 7) — so a one-time search
        # buys every later pinned process the good draw. The runner must
        # leave ``args`` intact for the real first call: with
        # ``donate_argnums`` it must thread device COPIES of the donated
        # args through the candidate, never the originals.
        if search and search_runner is None:
            raise ValueError("search requires a search_runner")
        self._search = int(search)
        self._search_runner = search_runner
        self._by_sig: Dict[Any, Callable] = {}

    @staticmethod
    def _sig(args):
        import jax

        leaves, treedef = jax.tree.flatten(args)
        return (
            tuple(
                (getattr(a, "shape", ()), str(getattr(a, "dtype", type(a))))
                for a in leaves
            ),
            treedef,
        )

    def __call__(self, *args):
        if self._cache_dir is None:
            return self._jit(*args)
        sig = self._sig(args)
        fn = self._by_sig.get(sig)
        if fn is None:
            fn = self._compile_or_load(args)
            self._by_sig[sig] = fn
        return fn(*args)

    def _compile_or_load(self, args):
        import jax

        lowered = self._jit.lower(*args)
        try:
            hlo = lowered.as_text()
        except Exception:  # noqa: BLE001 — lowering text unavailable
            return self._jit
        key_fields = dict(
            hlo=hashlib.sha256(hlo.encode()).hexdigest(), tag=self._tag
        )
        multiproc = getattr(jax, "process_count", lambda: 1)() > 1
        if multiproc:
            # per-PROCESS entries: a multi-host executable re-binds by
            # global device id, and each process must load the executable
            # serialized under its own process index / local assignment
            # (also: distinct keys mean no cross-process write races on a
            # shared cache dir)
            key_fields["proc"] = (
                f"{jax.process_index()}/{jax.process_count()}"
            )
            key_fields["local_ids"] = tuple(
                d.id for d in jax.local_devices()
            )
        key = workload_key(**key_fields)
        hit = load_executable(self._cache_dir, key, devices=self._devices)
        if hit is not None:
            print(
                f"exe_cache: pinned executable hit for {self._tag or 'fn'}",
                file=sys.stderr,
            )
            return hit[0]
        if multiproc and self._search > 1:
            # draw search is single-process only: the search runner's
            # adaptive chain lengths depend on locally measured times, so
            # processes would diverge mid-collective (the step programs
            # are collective — every process must call them in lockstep).
            # Pin the single compile instead.
            print(
                f"exe_cache: {self._tag or 'fn'}: draw search disabled "
                "under multi-process (collective lockstep); pinning the "
                "single compile",
                file=sys.stderr,
            )
        elif self._search > 1:
            best = best_ms = None  # fastest overall (returned)
            pin = pin_ms = None  # fastest WITH a payload (persisted)
            for i in range(self._search):
                # a fresh lowering per attempt — reusing one Lowered can
                # hand back a cached executable instead of a fresh draw
                cand = self._jit.lower(*args).compile()
                # capture the payload BEFORE timing: once any program
                # with a sort comparator has EXECUTED in the process,
                # serialization of such executables starts failing
                # (UNIMPLEMENTED: `LessThan` is not serializable —
                # measured flaky per candidate on jax-CPU), so candidates
                # that refuse to serialize are measured but cannot be
                # pinned
                rec = serialize_compiled(cand)
                ms = 1e3 * float(self._search_runner(cand, args))
                print(
                    f"exe_cache: {self._tag or 'fn'} draw {i}: "
                    f"{ms:.1f} ms" + ("" if rec else " (unserializable)"),
                    file=sys.stderr,
                )
                if best_ms is None or ms < best_ms:
                    best, best_ms = cand, ms
                if rec is not None and (pin_ms is None or ms < pin_ms):
                    pin, pin_ms = rec, ms
            if pin is not None:
                write_record(
                    self._cache_dir, key, pin,
                    {"tag": self._tag, "ms": pin_ms},
                )
            else:
                print(
                    f"exe_cache: {self._tag or 'fn'}: no candidate "
                    "serialized; nothing pinned",
                    file=sys.stderr,
                )
            return best
        compiled = lowered.compile()
        save_executable(
            self._cache_dir, key, compiled, {"tag": self._tag}
        )
        return compiled
