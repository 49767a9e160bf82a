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
"""

from __future__ import annotations

import contextlib
import glob
import json
import os
import sys
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
        self.started = time.time()

    # -- request handlers ----------------------------------------------------

    def handle_ping(self, req: dict) -> dict:
        return {"ok": True, "pong": True}

    def handle_stats(self, req: dict) -> dict:
        from .cache import cache_stats

        return {
            "ok": True,
            "requests": self.requests,
            "uptime_s": round(time.time() - self.started, 1),
            "caches": cache_stats(),
        }

    def handle_warm(self, req: dict) -> dict:
        """Ship the classifier + every subtree model/anchor set to the device
        now, so the first placement request doesn't pay the transfers."""
        from .cache import cache_stats, cached_checkpoint, cached_embeddings

        t0 = time.time()
        touched = 0
        cls = os.path.join(self.args.classifier_model, "classifier_model.ckpt")
        if os.path.exists(cls):
            cached_checkpoint(cls)
            touched += 1
        for ckpt in sorted(
            glob.glob(os.path.join(self.args.distance_model, "model_subtree_*.ckpt"))
        ):
            cached_checkpoint(ckpt)
            touched += 1
            stem = os.path.basename(ckpt)[len("model_subtree_") : -len(".ckpt")]
            emb = os.path.join(self.args.distance_model, f"embeddings_subtree_{stem}.csv")
            if os.path.exists(emb):
                cached_embeddings(emb)
        stats = cache_stats()
        return {
            "ok": True,
            "models": touched,
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
                # pipeline stages print operator logs; keep stdout pure
                # protocol (loggers already default to stderr)
                with contextlib.redirect_stdout(sys.stderr):
                    resp = handler(req)
                self.requests += 1
                respond(resp)
            except (Exception, SystemExit) as e:  # noqa: BLE001 — the daemon
                # must keep serving; stage code may sys.exit on bad input
                # (reference-compatible CLI behavior, e.g. a missing dir)
                respond({"ok": False, "error": f"{type(e).__name__}: {e}"})
        return 0


def serve_func(args) -> int:
    return ServeDaemon(args).serve()
