"""Persistent serving daemon: a JSON-lines request loop over warm device caches.

The reference serves placements by re-invoking `process_query_data` per query
batch (reference: main.py:626-651): every invocation pays interpreter +
backend init, recompiles the forward, and re-ships the classifier (~67 MB)
plus every touched subtree model (~76 MB each) host->device — on a tunneled
or PCIe link the parameter bytes alone dwarf the compute. The parameters do
not change between requests; the deployed pattern is a resident process that
transfers each model once (infer/cache.py) and answers subsequent requests at
the parse + compute floor. `kf2vec serve` is that process.

Protocol — one JSON object per line on stdin, one JSON response line per
request on stdout (all pipeline logging goes to stderr, so stdout carries
nothing but the protocol):

  {"cmd": "ping"}
      -> {"ok": true, "pong": true}
  {"cmd": "warm"}
      -> preload the classifier + every subtree model and anchor matrix into
         the device cache; reply reports models touched and resident bytes
  {"cmd": "stats"}
      -> cache hit/miss + residency counters and requests served
  {"cmd": "place", "input_dir": DIR, "output_dir": DIR}
      -> full pipeline on raw FASTA: extract features, classify, (FSW point
         sets if the library needs them,) query; reply lists written outputs.
         Optional: "k" (overrides the daemon's -k for extraction), "remap"
         (label-remap .tsv path, as `query -remap`)
  {"cmd": "place_features", "features_dir": DIR, "output_dir": DIR}
      -> classify + query on pre-extracted features (.kf and, for FSW
         libraries, {name}_k{k}.npy) — the hot path, no extraction.
         Optional: "remap"
  {"cmd": "quit"}
      -> {"ok": true, "bye": true} and exit (EOF exits too)

On startup the daemon emits {"ok": true, "event": "ready", ...} once the
backend is initialized, so clients can block on readiness. Per-request
failures return {"ok": false, "error": ...} and the loop keeps serving.

Per-request watchdog (-request_timeout T / KF2VEC_SERVE_REQUEST_TIMEOUT_S):
this rig's tunnel has produced device_put calls that never return
(ROUND4_NOTES "Rig reliability") — an exception handler cannot contain
those, so with a timeout set each handler runs on a deadlined worker
thread; a request that exceeds T gets {"ok": false, "error": "...timed
out..."} while the daemon stays alive for the next request. The wedged
worker is abandoned (a stuck runtime call cannot be cancelled from
Python); if the device is truly stalled, subsequent requests time out too
— degraded but answering, never hung. 0 (default) disables the watchdog.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import threading
import time


def _fsw_ks(distance_model_dir: str) -> list[int]:
    """k values of FSW subtree models in the library (meta-only reads)."""
    from ..train.checkpoint import fsw_k_from_meta, load_checkpoint_meta

    ks = set()
    for ckpt in glob.glob(os.path.join(distance_model_dir, "model_subtree_*.ckpt")):
        try:
            model_name, meta = load_checkpoint_meta(ckpt)
            if model_name == "NeuralNetFSW":
                ks.add(fsw_k_from_meta(meta))
        except Exception as e:
            print(f"WARNING: could not inspect {ckpt}: {e}", file=sys.stderr)
    return sorted(ks)


class ServeDaemon:
    def __init__(self, args):
        self.args = args
        self.requests = 0
        self.timeouts = 0
        self.started = time.time()
        # explicit flag > env > disabled
        t = float(getattr(args, "request_timeout", 0.0) or 0.0)
        if t <= 0:
            t = float(os.environ.get("KF2VEC_SERVE_REQUEST_TIMEOUT_S", "0") or 0)
        self.request_timeout_s = t if t > 0 else 0.0

    # -- request handlers ----------------------------------------------------

    def handle_ping(self, req: dict) -> dict:
        return {"ok": True, "pong": True}

    def handle_stats(self, req: dict) -> dict:
        from .cache import cache_stats

        return {
            "ok": True,
            "requests": self.requests,
            "request_timeouts": self.timeouts,
            "uptime_s": round(time.time() - self.started, 1),
            "caches": cache_stats(),
        }

    def handle_warm(self, req: dict) -> dict:
        """Ship the classifier + every subtree model/anchor set to the device
        now, AND pre-compile the per-block serving programs (classifier
        forward + fused query step at the small-placement row bucket), so
        the first placement request pays neither transfers nor the remote
        compile service (measured 4-42 s of first-request latency on this
        rig). {"compile": false} skips the pre-compilation."""
        import numpy as np

        from ..train.step import bucket_items
        from .cache import cache_stats, cached_checkpoint, cached_embeddings

        t0 = time.time()
        touched = 0
        compiled = 0
        precompile = bool(req.get("compile", True))
        done_shapes: set = set()
        cls = os.path.join(self.args.classifier_model, "classifier_model.ckpt")
        if os.path.exists(cls):
            _, meta, params = cached_checkpoint(cls)
            touched += 1
            if precompile:
                from .classify import _CLS_FORWARD

                x = np.zeros(
                    (bucket_items(1, floor=64), int(meta["model_input_size"])),
                    np.float32,
                )
                np.asarray(_CLS_FORWARD(params, x)[:1, :1])
                compiled += 1
        for ckpt in sorted(
            glob.glob(os.path.join(self.args.distance_model, "model_subtree_*.ckpt"))
        ):
            model_name, meta, params = cached_checkpoint(ckpt)
            touched += 1
            stem = os.path.basename(ckpt)[len("model_subtree_") : -len(".ckpt")]
            emb = os.path.join(self.args.distance_model, f"embeddings_subtree_{stem}.csv")
            if not os.path.exists(emb):
                continue
            _, emb_dev = cached_embeddings(emb)
            if not precompile:
                continue
            nb = bucket_items(1)  # the many-subtrees x few-queries block shape
            import jax as _jax

            # jit keys executables on the FULL params pytree shapes (hidden
            # size, fswout, ...), so the dedup key must too — two models with
            # equal input/anchor shapes but different hidden sizes still need
            # separate compiles
            param_shapes = tuple(
                tuple(leaf.shape) for leaf in _jax.tree.leaves(params)
            )
            if model_name == "NeuralNetFSW":
                from ..kmer.vocab import canonical_vocab_size
                from ..train.checkpoint import fsw_k_from_meta
                from .query import _QSTEP_FSW

                k = fsw_k_from_meta(meta)
                if not (1 <= k <= 9):
                    continue  # geometric-bucket point sets: shape unknowable here
                shape_key = ("fsw", k, emb_dev.shape, param_shapes)
                if shape_key in done_shapes:
                    continue
                x = np.zeros((nb, canonical_vocab_size(k), k + 1), np.float32)
                np.asarray(_QSTEP_FSW(params, x, emb_dev)[:1, :1])
            else:
                from .query import _QSTEP_DENSE

                shape_key = (
                    "dense", int(meta["model_input_size"]), emb_dev.shape,
                    param_shapes,
                )
                if shape_key in done_shapes:
                    continue
                x = np.zeros((nb, int(meta["model_input_size"])), np.float32)
                np.asarray(_QSTEP_DENSE(params, x, emb_dev)[:1, :1])
            done_shapes.add(shape_key)
            compiled += 1
        stats = cache_stats()
        return {
            "ok": True,
            "models": touched,
            "compiled": compiled,
            "seconds": round(time.time() - t0, 3),
            "device_bytes": stats["checkpoints"]["device_bytes"]
            + stats["anchors"]["device_bytes"],
        }

    def handle_place(self, req: dict) -> dict:
        """Raw-FASTA placement: feature extraction + classify + query
        (the stages of the process_query_data wrapper, cli.py)."""
        input_dir = req["input_dir"]
        output_dir = req["output_dir"]
        os.makedirs(output_dir, exist_ok=True)
        from ..ingest.frequencies import get_frequencies

        get_frequencies(
            input_dir,
            output_dir,
            k=req.get("k", self.args.k),
            threads=self.args.p,
            pseudocount=self.args.pseudocount,
        )
        for fk in _fsw_ks(self.args.distance_model):
            from ..ingest.kmers import get_kmers

            get_kmers(input_dir, output_dir, k=fk)
        return self._classify_and_query(output_dir, output_dir, req.get("remap"))

    def handle_place_features(self, req: dict) -> dict:
        """Pre-extracted-features placement: classify + query only."""
        return self._classify_and_query(
            req["features_dir"], req["output_dir"], req.get("remap")
        )

    def _classify_and_query(
        self, features_dir: str, output_dir: str, remap: str | None = None
    ) -> dict:
        from ..utils import phases
        from .classify import classify_func
        from .query import query_func

        files = sorted(glob.glob(os.path.join(features_dir, "*.kf")))
        if not files:
            raise FileNotFoundError(f"no .kf feature files in {features_dir}")
        os.makedirs(output_dir, exist_ok=True)
        t0 = time.time()
        with phases.collect() as ph:
            classes_out = classify_func(
                features_dir, files, self.args.classifier_model,
                self.args.cl_seed, output_dir,
            )
            written = query_func(
                features_dir, files, self.args.distance_model, output_dir,
                self.args.di_seed, output_dir, remap_path=remap,
            )
        dt = time.time() - t0
        return {
            "ok": True,
            "queries": len(files),
            "seconds": round(dt, 3),
            "outputs": [classes_out] + written,
            "phases_ms": {
                k: round(1e3 * v, 1)
                for k, v in sorted(ph.items())
                if k != "dispatches"
            },
            "dispatches": int(ph.get("dispatches", 0)),
        }

    # -- loop ----------------------------------------------------------------

    def _call_handler(self, handler, req: dict) -> dict:
        """Run one handler, deadlined when request_timeout_s is set.

        The worker is a daemon thread: a handler wedged inside a runtime
        call (the failure mode this exists for) is abandoned, never joined
        — the loop answers with an error and moves on. Exceptions raised by
        the handler propagate to the loop's normal per-request handler.

        warm gets its own (longer) deadline: pre-compilation legitimately
        takes minutes on a cold remote compile service, so a placement-scale
        -request_timeout must not read a healthy warm as wedged
        (KF2VEC_SERVE_WARM_TIMEOUT_S, default 900, floor'd by the request
        timeout)."""
        timeout_s = self.request_timeout_s
        if timeout_s and handler == self.handle_warm:
            timeout_s = max(
                timeout_s,
                float(os.environ.get("KF2VEC_SERVE_WARM_TIMEOUT_S", "900") or 0),
            )
        if not timeout_s:
            return handler(req)
        box = {}
        done = threading.Event()

        def target():
            try:
                box["resp"] = handler(req)
            except BaseException as e:  # noqa: BLE001 — re-raised in the loop
                box["err"] = e
            finally:
                done.set()

        t = threading.Thread(target=target, daemon=True, name="serve-request")
        t.start()
        if not done.wait(timeout_s):
            self.timeouts += 1
            return {
                "ok": False,
                "timeout": True,
                "error": (
                    f"request exceeded {timeout_s:g}s watchdog "
                    "(device stalled?); daemon still serving"
                ),
            }
        if "err" in box:
            raise box["err"]
        return box["resp"]

    def serve(self, stdin=None, stdout=None) -> int:
        stdin = stdin if stdin is not None else sys.stdin
        out = stdout if stdout is not None else sys.stdout
        handlers = {
            "ping": self.handle_ping,
            "stats": self.handle_stats,
            "warm": self.handle_warm,
            "place": self.handle_place,
            "place_features": self.handle_place_features,
        }

        def respond(obj: dict) -> None:
            out.write(json.dumps(obj) + "\n")
            out.flush()

        n_models = len(
            glob.glob(os.path.join(self.args.distance_model, "model_subtree_*.ckpt"))
        )
        respond(
            {
                "ok": True,
                "event": "ready",
                "subtree_models": n_models,
                "classifier_model": self.args.classifier_model,
                "distance_model": self.args.distance_model,
            }
        )
        # pipeline stages print operator logs; keep stdout pure protocol for
        # the loop's LIFETIME rather than per-request (loggers already
        # default to stderr). A with-redirect per request would be unsafe
        # under the watchdog: an abandoned wedged worker exiting its context
        # later could yank sys.stdout back mid-request; only this thread
        # ever restores it.
        old_stdout = sys.stdout
        sys.stdout = sys.stderr
        try:
            for line in stdin:
                line = line.strip()
                if not line:
                    continue
                try:
                    req = json.loads(line)
                    cmd = req.get("cmd")
                    if cmd == "quit":
                        respond({"ok": True, "bye": True})
                        break
                    handler = handlers.get(cmd)
                    if handler is None:
                        respond(
                            {
                                "ok": False,
                                "error": f"unknown cmd {cmd!r}",
                                "commands": sorted(handlers) + ["quit"],
                            }
                        )
                        continue
                    resp = self._call_handler(handler, req)
                    self.requests += 1
                    respond(resp)
                except (Exception, SystemExit) as e:  # noqa: BLE001 — the
                    # daemon must keep serving; stage code may sys.exit on
                    # bad input (reference-compatible CLI behavior)
                    respond({"ok": False, "error": f"{type(e).__name__}: {e}"})
        finally:
            sys.stdout = old_stdout
        return 0


def serve_func(args) -> int:
    daemon = ServeDaemon(args)
    rc = daemon.serve()
    _exit_daemon(daemon, rc)
    return rc


def _exit_daemon(daemon: ServeDaemon, rc: int) -> None:
    """After any watchdog timeout an abandoned worker may still sit inside a
    wedged runtime call; interpreter shutdown then aborts (observed SIGABRT
    from the PJRT client destructor). The protocol stream is complete at
    this point, so leave via os._exit instead."""
    if daemon.timeouts:
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(rc)
