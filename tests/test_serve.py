"""Persistent calling service (svision_tpu/serve.py): one warm engine, many
requests; per-request output equals a standalone CLI run."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def serve_ws(tmp_path_factory):
    import jax
    from svision_tpu.models import alexnet
    from svision_tpu.models.checkpoint import save_params
    from tests import synth

    root = tmp_path_factory.mktemp("serve")
    genome = str(root / "ref.fa")
    seqs = synth.make_genome(genome, {"chr1": 90000}, seed=17)
    bam_a = str(root / "a.bam")
    synth.make_sv_bam(bam_a, seqs, seed=17, support=7,
                      events=[("DEL", "chr1", 30000, 280)])
    bam_b = str(root / "b.bam")
    synth.make_sv_bam(bam_b, seqs, seed=18, support=7,
                      events=[("INS", "chr1", 50000, 200)])
    weights = str(root / "w.npz")
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)
    return dict(root=root, genome=genome, bams=[bam_a, bam_b],
                weights=weights)


@pytest.mark.slow
def test_serve_two_requests_match_cli(serve_ws, tmp_path):
    from svision_tpu.cli import parse_arguments, run_pipeline

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "svision_tpu.serve",
         "-g", serve_ws["genome"], "-m", serve_ws["weights"],
         "-s", "3", "--batch_size", "16"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.getcwd())
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready.get("ready") is True

        replies = []
        for i, bam in enumerate(serve_ws["bams"]):
            req = {"bam": bam, "out": str(tmp_path / f"r{i}"),
                   "sample": f"S{i}"}
            proc.stdin.write(json.dumps(req) + "\n")
            proc.stdin.flush()
            replies.append(json.loads(proc.stdout.readline()))
        # ping + shutdown round-trips
        proc.stdin.write('{"cmd": "ping"}\n')
        proc.stdin.flush()
        assert json.loads(proc.stdout.readline())["pong"] is True
        proc.stdin.write('{"cmd": "shutdown"}\n')
        proc.stdin.flush()
        assert json.loads(proc.stdout.readline())["bye"] is True
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()

    for i, (bam, rep) in enumerate(zip(serve_ws["bams"], replies)):
        assert rep["ok"], rep
        assert rep["records"] >= 1
        # standalone CLI run must produce the identical VCF
        direct = run_pipeline(parse_arguments(
            ["-o", str(tmp_path / f"d{i}"), "-b", bam,
             "-g", serve_ws["genome"], "-m", serve_ws["weights"],
             "-n", f"S{i}", "-s", "3", "--batch_size", "16"]))
        assert open(rep["vcf"]).read() == open(direct).read()


@pytest.mark.slow
def test_serve_error_reply_keeps_server_alive(serve_ws, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "svision_tpu.serve",
         "-g", serve_ws["genome"], "-m", serve_ws["weights"],
         "-s", "3", "--batch_size", "16"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True, env=env,
        cwd=os.getcwd())
    try:
        json.loads(proc.stdout.readline())          # ready banner
        proc.stdin.write(json.dumps(
            {"bam": "/nope/missing.bam", "out": str(tmp_path / "x"),
             "sample": "S"}) + "\n")
        proc.stdin.flush()
        bad = json.loads(proc.stdout.readline())
        assert bad["ok"] is False and bad["error"]
        # server survives: a good request still works
        proc.stdin.write(json.dumps(
            {"bam": serve_ws["bams"][0], "out": str(tmp_path / "y"),
             "sample": "S"}) + "\n")
        proc.stdin.flush()
        good = json.loads(proc.stdout.readline())
        assert good["ok"] is True
        proc.stdin.write('{"cmd": "shutdown"}\n')
        proc.stdin.flush()
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_serve_protocol_survives_empty_callset_and_rejects_engine_flags(
        serve_ws, tmp_path):
    """Two round-3 review findings: (a) pipeline print()s (e.g. the
    empty-score abort) must not corrupt the stdout JSON protocol; (b)
    engine-fixed flags in request args are rejected, not ignored."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "svision_tpu.serve",
         "-g", serve_ws["genome"], "-m", serve_ws["weights"],
         "-s", "3", "--batch_size", "16"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env, cwd=os.getcwd())
    try:
        json.loads(proc.stdout.readline())          # ready banner
        # (a) region with no SVs -> empty callset -> the pipeline's
        # "Empty output in the score file!!!" print must NOT appear on
        # stdout; the reply must be one clean JSON error line
        proc.stdin.write(json.dumps(
            {"bam": serve_ws["bams"][0], "out": str(tmp_path / "e"),
             "sample": "S", "region": "chr1:1-2000"}) + "\n")
        proc.stdin.flush()
        rep = json.loads(proc.stdout.readline())
        assert rep["ok"] is False and "exit" in rep["error"]
        # (b) engine-fixed flag rejected with a helpful error
        proc.stdin.write(json.dumps(
            {"bam": serve_ws["bams"][0], "out": str(tmp_path / "f"),
             "sample": "S", "args": ["--exact"]}) + "\n")
        proc.stdin.flush()
        rep2 = json.loads(proc.stdout.readline())
        assert rep2["ok"] is False and "--exact" in rep2["error"]
        # (b') ADVICE r3: pipeline-mode flags (sharding/coordinator/
        # profiling) divert run_pipeline around the warm engine — rejected
        # too, not accepted-and-half-honored
        proc.stdin.write(json.dumps(
            {"bam": serve_ws["bams"][0], "out": str(tmp_path / "f2"),
             "sample": "S", "args": ["--num_shards", "2"]}) + "\n")
        proc.stdin.flush()
        rep2b = json.loads(proc.stdout.readline())
        assert rep2b["ok"] is False and "--num_shards" in rep2b["error"]
        # server still healthy
        proc.stdin.write(json.dumps(
            {"bam": serve_ws["bams"][0], "out": str(tmp_path / "g"),
             "sample": "S"}) + "\n")
        proc.stdin.flush()
        assert json.loads(proc.stdout.readline())["ok"] is True
        proc.stdin.write('{"cmd": "shutdown"}\n')
        proc.stdin.flush()
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()


@pytest.mark.slow
def test_serve_socket_concurrent_clients(serve_ws, tmp_path):
    """VERDICT r3 #6 — serving under concurrency: N clients against one
    --socket server. Asserts per-connection reply ordering (id echo),
    per-request VCF byte-identity with a standalone CLI run, a malformed
    line erroring only its own connection, and a clean shutdown that
    drains requests already in flight."""
    import socket
    import threading
    from svision_tpu.cli import parse_arguments, run_pipeline

    sock_path = str(tmp_path / "svs.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "svision_tpu.serve",
         "-g", serve_ws["genome"], "-m", serve_ws["weights"],
         "-s", "3", "--batch_size", "16", "--socket", sock_path],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=os.getcwd())
    try:
        ready = json.loads(proc.stdout.readline())
        assert ready.get("ready") and ready["socket"] == sock_path

        def client(n_reqs, bam, outbase, results, tag):
            conn = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
            conn.connect(sock_path)
            f = conn.makefile("r", encoding="utf-8")
            for i in range(n_reqs):
                req = {"bam": bam, "out": f"{outbase}_{i}",
                       "sample": f"S{tag}", "id": f"{tag}:{i}"}
                conn.sendall((json.dumps(req) + "\n").encode())
            for _ in range(n_reqs):
                results.append(json.loads(f.readline()))
            conn.close()

        threads, results = [], {}
        for t, bam in enumerate(serve_ws["bams"] * 2):   # 4 clients
            results[t] = []
            th = threading.Thread(
                target=client,
                args=(2, bam, str(tmp_path / f"c{t}"), results[t], t))
            th.start()
            threads.append(th)
        for th in threads:
            th.join(timeout=600)
            assert not th.is_alive()
        for t in range(4):
            assert [r.get("id") for r in results[t]] == \
                [f"{t}:0", f"{t}:1"], results[t]      # FIFO per connection
            assert all(r["ok"] for r in results[t]), results[t]

        # byte-identity: client 0's first VCF vs a standalone CLI run
        opts = parse_arguments(
            ["-o", str(tmp_path / "solo"), "-b", serve_ws["bams"][0],
             "-g", serve_ws["genome"], "-m", serve_ws["weights"],
             "-n", "S0", "-s", "3", "--batch_size", "16"])
        os.makedirs(opts.out_path, exist_ok=True)
        solo = run_pipeline(opts)
        body = lambda p: [ln for ln in open(p) if not ln.startswith("##")]
        assert body(results[0][0]["vcf"]) == body(solo)

        # malformed line on one connection errors THAT connection only
        bad = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        bad.connect(sock_path)
        bf = bad.makefile("r", encoding="utf-8")
        bad.sendall(b"{nonsense\n")
        assert json.loads(bf.readline())["ok"] is False
        # ... and the same connection still works afterwards
        bad.sendall((json.dumps({"cmd": "ping", "id": "p"}) + "\n").encode())
        rep = json.loads(bf.readline())
        assert rep["pong"] is True and rep["id"] == "p"

        # shutdown with a request in flight: the request (queued first on
        # the same connection) must still complete before the bye
        req = {"bam": serve_ws["bams"][1], "out": str(tmp_path / "fin"),
               "sample": "FIN", "id": "fin"}
        bad.sendall((json.dumps(req) + "\n").encode())
        bad.sendall(b'{"cmd": "shutdown"}\n')
        fin = json.loads(bf.readline())
        assert fin["ok"] is True and fin["id"] == "fin"
        assert json.loads(bf.readline()).get("bye") is True
        bad.close()
        assert proc.wait(timeout=60) == 0
        assert not os.path.exists(sock_path)
    finally:
        if proc.poll() is None:
            proc.kill()
        proc.wait()
