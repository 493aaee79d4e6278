#!/usr/bin/env python
"""Serve an exported model over HTTP (the TIS role; see deploy/server.py).

  python tools/serve.py --engine model.shlo [--port 8000] [--instances 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", required=True)
    ap.add_argument("--name", default="bisenetv2")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--instances", type=int, default=2)
    args = ap.parse_args()

    from mds_tpu.deploy.server import InferenceServer

    srv = InferenceServer(args.engine, name=args.name, instances=args.instances)
    print(f"serving {args.name} ({srv.in_shape}) on :{args.port}")
    srv.serve(args.port)


if __name__ == "__main__":
    main()
