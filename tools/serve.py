"""Serve an exported segtpu artifact over HTTP.

Usage: python tools/serve.py ARTIFACT_DIR [--host H] [--port P]

The artifact is produced by ``Segmenter.export(dir)`` /
``segtpu.infer.save_serving``; protocol in segtpu/infer/serve.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("artifact_dir")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8787)
    ap.add_argument("--tiled", action="store_true",
                    help="serve images of ANY spatial size via "
                         "sliding-window tiling on the artifact "
                         "(whole-slide serving)")
    ap.add_argument("--tile-overlap", type=int, default=32,
                    help="tile context in pixels; with --tile-mode halo "
                         "this is the measured throughput preset "
                         "(overlap 32 = halo 16, PERF.md round 5)")
    ap.add_argument("--tile-mode", choices=("halo", "blend"),
                    default="halo",
                    help="halo: exact per-tile composition, highest "
                         "throughput; blend: cosine overlap-add "
                         "probability averaging, smoothest seams")
    ap.add_argument("--batch-tiles", type=int, default=None,
                    help="bound tiles per forward (peak HBM); default "
                         "auto-sizes to one forward per image")
    args = ap.parse_args()

    from segtpu.infer.serve import make_server
    server = make_server(args.artifact_dir, args.host, args.port,
                         tiled=args.tiled, tile_overlap=args.tile_overlap,
                         tile_mode=args.tile_mode,
                         batch_tiles=args.batch_tiles)
    host, port = server.server_address[:2]
    tiled_note = (f", tiled={args.tile_mode}/overlap{args.tile_overlap}"
                  if args.tiled else "")
    print(f"serving {args.artifact_dir} "
          f"(img_size={server.artifact_meta['img_size']}{tiled_note}) "
          f"on http://{host}:{port} — GET /health, POST /predict", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
