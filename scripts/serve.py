#!/usr/bin/env python
"""Model serving HTTP front-end (beyond the reference — it has no
deployment path; this serves the same checkpoints the experiments write).

Endpoints:
  GET  /healthz            → {"status": "ok", "model": ...}
  POST /predict            → {"probs": [[p0, p1], ...], "pred": [cls, ...]}
       body: .npy bytes (N, S, S[, 1]) raw frames, or JSON {"images": [...]}
       single-image posts are coalesced across connections by the
       latency-bounded BatchAggregator (serving/engine.py).

Usage:
  python scripts/serve.py --checkpoint runs/.../best.ckpt [--port 8000]
  python scripts/serve.py --model swin_tiny [--quality] [--no-warmup]
"""
from __future__ import annotations

import argparse
import io
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_handler(engine, aggregator, model_name):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": model_name,
                                 "buckets": list(engine.buckets)})
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/predict":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                ctype = self.headers.get("Content-Type", "")
                if "json" in ctype:
                    images = np.asarray(json.loads(raw)["images"], np.float32)
                else:
                    images = np.load(io.BytesIO(raw), allow_pickle=False)
                if images.ndim == 2:
                    images = images[None]
                if images.ndim == 3:
                    images = images[..., None]
                if images.shape[0] == 1:
                    probs = aggregator.submit(images[0])[None]
                else:
                    probs = engine.predict(images)
                self._send(200, {
                    "probs": np.asarray(probs, np.float64).round(6).tolist(),
                    "pred": np.argmax(probs, axis=-1).tolist(),
                })
            except Exception as exc:  # surface the error to the client
                self._send(400, {"error": f"{type(exc).__name__}: {exc}"})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return Handler


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--model", default=None,
                   help="model name for a fresh (untrained) engine when no "
                        "checkpoint is given — smoke/perf testing")
    p.add_argument("--img-size", type=int, default=None)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--buckets", type=int, nargs="*", default=[1, 8, 32, 128])
    p.add_argument("--quality", action="store_true")
    p.add_argument("--preprocessed", action="store_true",
                   help="inputs are already resized+normalized")
    p.add_argument("--max-delay-ms", type=float, default=10.0)
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="serve Dense/Conv contractions in int8 PTQ "
                        "(serving/quantize.py)")
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each bucket's batch over N devices "
                        "(ICI data-parallel serving; buckets round up to "
                        "multiples of N)")
    p.add_argument("--no-warmup", action="store_true")
    p.add_argument("--bundle", default=None,
                   help="serve a frozen StableHLO export bundle "
                        "(scripts/export_serving.py) — no model code runs")
    args = p.parse_args()

    from thyroid_tpu.serving import BatchAggregator, InferenceEngine

    if args.bundle is not None:
        if args.checkpoint or args.model or args.quantize \
                or args.data_parallel > 1:
            p.error("--bundle is exclusive with --checkpoint/--model/"
                    "--quantize/--data-parallel (the bundle froze those "
                    "choices at export time)")
        from thyroid_tpu.serving import load_exported

        engine = load_exported(args.bundle)
        name = f"bundle:{engine.manifest['model_config'].get('name', '?')}"
    else:
        mcfg = None
        if args.model:
            mcfg = {"name": args.model, "in_channels": 1, "num_classes": 2,
                    "dtype": "bf16"}
            if args.img_size:
                mcfg["img_size"] = args.img_size
        mesh = None
        if args.data_parallel > 1:
            from thyroid_tpu.parallel.mesh import create_mesh

            mesh = create_mesh({"data": args.data_parallel})
        engine = InferenceEngine(model_config=mcfg, checkpoint=args.checkpoint,
                                 buckets=args.buckets, quality=args.quality,
                                 raw_inputs=not args.preprocessed,
                                 quantize=args.quantize, mesh=mesh)
        name = args.model or str(args.checkpoint)
    if not args.no_warmup:
        print("warming up bucket programs...", flush=True)
        engine.warmup()
    aggregator = BatchAggregator(engine, max_delay_ms=args.max_delay_ms)
    server = ThreadingHTTPServer((args.host, args.port),
                                 build_handler(engine, aggregator, name))
    print(f"serving {name} on http://{args.host}:{args.port}", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        aggregator.close()


if __name__ == "__main__":
    main()
