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
    args = ap.parse_args()

    from segtpu.infer.serve import make_server
    server = make_server(args.artifact_dir, args.host, args.port)
    host, port = server.server_address[:2]
    print(f"serving {args.artifact_dir} "
          f"(img_size={server.artifact_meta['img_size']}) "
          f"on http://{host}:{port} — GET /health, POST /predict", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
