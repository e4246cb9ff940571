#!/usr/bin/env python
"""Spin up a local CoFHE-TPU network: 1 setup + 3 CoFHE + 1 compute node
(the reference's scripts/start_network.sh topology, ports 4455-4459), then
optionally run the demo client.

    python scripts/start_network.py [--toy] [--tls] [--device host|tpu]

Nodes run as subprocesses (like the reference's nohup'd binaries); logs go
to /tmp/cofhe_net/. Ctrl-C tears the network down.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--toy", action="store_true")
    ap.add_argument("--tls", action="store_true")
    ap.add_argument("--device", default="host")
    ap.add_argument("--base-port", type=int, default=4455)
    ap.add_argument("--client", action="store_true", help="run the demo client then exit")
    args = ap.parse_args()

    logdir = "/tmp/cofhe_net"
    os.makedirs(logdir, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")

    tls_args: list[str] = []
    if args.tls:
        cert, key = os.path.join(logdir, "server.pem"), os.path.join(logdir, "server_key.pem")
        if not os.path.exists(cert):
            subprocess.run(
                ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-keyout", key,
                 "-out", cert, "-days", "365", "-nodes", "-subj", "/CN=localhost"],
                check=True, capture_output=True)
        tls_args = ["--cert", cert, "--key", key]

    common = (["--toy"] if args.toy else []) + ["--device", args.device] + tls_args
    base = args.base_port
    procs = []

    def launch(role, port, extra=()):
        log = open(os.path.join(logdir, f"{role}_{port}.log"), "w")
        cmd = [sys.executable, "-m", "cofhe_tpu.node.cli", role, "127.0.0.1", str(port),
               "127.0.0.1", str(base)] + common + list(extra)
        p = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT, env=env, cwd=ROOT)
        procs.append(p)
        return p

    launch("setup_node", base)
    time.sleep(2 if not args.toy else 1)
    for i in range(1, 4):
        launch("cofhe_node", base + i)
    time.sleep(2)
    launch("compute_node", base + 4)
    time.sleep(2)
    print(f"network up: setup={base}, cofhe={base+1}..{base+3}, compute={base+4}")
    print(f"logs in {logdir}/")

    if args.client:
        rc = subprocess.run(
            [sys.executable, "-m", "cofhe_tpu.node.cli", "client_node", "127.0.0.1", "0",
             "127.0.0.1", str(base)] + common, env=env, cwd=ROOT).returncode
        for p in procs:
            p.send_signal(signal.SIGTERM)
        sys.exit(rc)

    try:
        while True:
            time.sleep(5)
            for p in procs:
                if p.poll() is not None:
                    print(f"node pid {p.pid} exited rc={p.returncode}", file=sys.stderr)
    except KeyboardInterrupt:
        pass
    finally:
        for p in procs:
            p.send_signal(signal.SIGTERM)


if __name__ == "__main__":
    main()
