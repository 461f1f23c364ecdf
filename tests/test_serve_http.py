"""HTTP serving front door (pointvit_tpu/serve_http.py): endpoint contract,
both body encodings, micro-batcher coalescing under concurrent clients,
error paths, and clean shutdown."""

import io
import json
import os
import subprocess
import sys
import threading
import urllib.error
import urllib.request

import jax
import numpy as np
import pytest

from pointvit_tpu.models.factory import build_model
from pointvit_tpu.serve import InferenceSession
from pointvit_tpu.serve_http import make_server

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_POINTS, N_CH, N_CLASSES = 64, 4, 15


@pytest.fixture(scope="module")
def server():
    """Tiny random-init APF behind a live server on an ephemeral port."""
    cfg = {
        "num_classes": N_CLASSES, "in_channels": N_CH,
        "vit_name": "vit_base_patch16_224", "pretrained": False,
        "embedding_dim": 32, "npoint": 16, "nsample": 8,
        "dropout_rate": 0.0, "dropout_path_rate": 0.0,
        "depth": 2, "num_heads": 4, "bf16": False,
    }
    model = build_model(cfg)
    example = np.zeros((1, N_POINTS, N_CH), np.float32)
    variables = model.init(jax.random.PRNGKey(0), example, train=False)
    session = InferenceSession(
        model, variables["params"], variables.get("batch_stats"),
        buckets=(4, 8),
    )
    srv = make_server(session, host="127.0.0.1", port=0, max_delay_ms=20.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield srv, session, base
    srv.shutdown()
    srv.server_close()
    thread.join(timeout=10)


def _post(base, path, body: bytes, content_type: str):
    req = urllib.request.Request(
        base + path, data=body, headers={"Content-Type": content_type},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return resp.status, json.loads(resp.read())


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_health(server):
    _, session, base = server
    with urllib.request.urlopen(base + "/v1/health", timeout=30) as resp:
        assert resp.status == 200
        obj = json.loads(resp.read())
    assert obj["status"] == "ok"
    assert obj["buckets"] == list(session.buckets)


def test_classify_json_matches_session(server):
    _, session, base = server
    cloud = np.random.default_rng(0).standard_normal(
        (N_POINTS, N_CH)).astype(np.float32)
    status, obj = _post(
        base, "/v1/classify",
        json.dumps({"points": cloud.tolist()}).encode(), "application/json")
    assert status == 200
    want = np.asarray(session.predict_logits(cloud[None])[0])
    np.testing.assert_allclose(np.asarray(obj["logits"]), want, rtol=1e-5,
                               atol=1e-5)
    assert obj["class_id"] == int(np.argmax(want))


def test_classify_batch_npy(server):
    _, session, base = server
    clouds = np.random.default_rng(1).standard_normal(
        (3, N_POINTS, N_CH)).astype(np.float32)
    status, obj = _post(
        base, "/v1/classify_batch", _npy_bytes(clouds), "application/x-npy")
    assert status == 200
    want = np.asarray(session.predict_logits(clouds))
    got = np.asarray(obj["logits"])
    assert got.shape == (3, N_CLASSES)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert obj["class_ids"] == np.argmax(want, axis=-1).tolist()


def test_concurrent_clients_coalesce(server):
    """8 threads posting single clouds all get their own correct logits
    (the batcher flushes them as coalesced padded batches)."""
    _, session, base = server
    clouds = np.random.default_rng(2).standard_normal(
        (8, N_POINTS, N_CH)).astype(np.float32)
    want = np.asarray(session.predict_logits(clouds))
    results: list = [None] * len(clouds)

    def worker(i):
        _, obj = _post(
            base, "/v1/classify", _npy_bytes(clouds[i]), "application/x-npy")
        results[i] = np.asarray(obj["logits"])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(clouds))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i in range(len(clouds)):
        np.testing.assert_allclose(results[i], want[i], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("path,body,ctype,msg", [
    ("/v1/classify", b"", "application/json", "empty request body"),
    ("/v1/classify", b"not json", "application/json", "invalid JSON"),
    ("/v1/classify", b'{"pts": []}', "application/json", '"points" key'),
    ("/v1/classify", b"\x00\x01", "application/x-npy", "invalid .npy"),
])
def test_bad_bodies_are_400(server, path, body, ctype, msg):
    _, _, base = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, path, body, ctype)
    assert ei.value.code == 400
    assert msg in json.loads(ei.value.read())["error"]


def test_wrong_ndim_is_400(server):
    _, _, base = server
    flat = np.zeros((N_POINTS * N_CH,), np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, "/v1/classify", _npy_bytes(flat), "application/x-npy")
    assert ei.value.code == 400
    assert "2-d" in json.loads(ei.value.read())["error"]
    batch = np.zeros((2, N_POINTS, N_CH), np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, "/v1/classify", _npy_bytes(batch), "application/x-npy")
    assert ei.value.code == 400


def test_npy_response_negotiation(server):
    """Accept: application/x-npy returns binary f32 logits (classify adds
    X-Class-Id); values match the JSON path bit-for-bit at f32."""
    _, session, base = server
    cloud = np.random.default_rng(5).standard_normal(
        (N_POINTS, N_CH)).astype(np.float32)
    want = np.asarray(session.predict_logits(cloud[None])[0], np.float32)

    req = urllib.request.Request(
        base + "/v1/classify", data=_npy_bytes(cloud),
        headers={"Content-Type": "application/x-npy",
                 "Accept": "application/x-npy"},
        method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.headers["Content-Type"] == "application/x-npy"
        class_id = int(resp.headers["X-Class-Id"])
        got = np.load(io.BytesIO(resp.read()))
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert class_id == int(np.argmax(want))

    clouds = np.stack([cloud, cloud * 0.5])
    req = urllib.request.Request(
        base + "/v1/classify_batch", data=_npy_bytes(clouds),
        headers={"Content-Type": "application/x-npy",
                 "Accept": "application/octet-stream"},
        method="POST")
    with urllib.request.urlopen(req, timeout=60) as resp:
        got = np.load(io.BytesIO(resp.read()))
    assert got.shape == (2, N_CLASSES) and got.dtype == np.float32
    want2 = np.asarray(session.predict_logits(clouds), np.float32)
    np.testing.assert_allclose(got, want2, rtol=1e-5, atol=1e-5)


def test_mixed_shape_concurrent_clients(server):
    """Clients with different point counts coalesced into the same batcher
    tick must all succeed: _flush groups by shape before stacking (advisor
    r4 — one odd N used to fan a stack error to every caller)."""
    _, session, base = server
    rng = np.random.default_rng(3)
    clouds = [rng.standard_normal((n, N_CH)).astype(np.float32)
              for n in (N_POINTS, 48, N_POINTS, 48)]
    results: list = [None] * len(clouds)

    def worker(i):
        status, obj = _post(
            base, "/v1/classify", _npy_bytes(clouds[i]), "application/x-npy")
        results[i] = (status, np.asarray(obj["logits"]))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(clouds))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    for i, cloud in enumerate(clouds):
        status, got = results[i]
        assert status == 200
        want = np.asarray(session.predict_logits(cloud[None])[0])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_oversized_body_is_413(server):
    """A huge Content-Length is refused before any allocation, and the
    connection is closed (the body was never read)."""
    import http.client

    srv, _, base = server
    host, port = base.split("//")[1].rsplit(":", 1)
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("POST", "/v1/classify")
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", str(10**12))
        conn.endheaders()  # never send the body
        resp = conn.getresponse()
        assert resp.status == 413
        assert "cap" in json.loads(resp.read())["error"]
        assert resp.getheader("Connection") == "close"
    finally:
        conn.close()


def test_post_404_keeps_connection_usable(server):
    """An unknown-route POST with a body must drain the body: on a
    keep-alive connection the next request has to parse cleanly (advisor
    r4 — unread bytes used to corrupt the connection)."""
    import http.client

    _, _, base = server
    host, port = base.split("//")[1].rsplit(":", 1)
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        body = json.dumps({"points": [[0.0] * N_CH] * 4}).encode()
        conn.request("POST", "/v1/nope", body=body,
                     headers={"Content-Type": "application/json"})
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        conn.request("GET", "/v1/health")  # same socket
        r2 = conn.getresponse()
        assert r2.status == 200
        assert json.loads(r2.read())["status"] == "ok"
    finally:
        conn.close()


def test_server_fault_is_500(server):
    """A cloud that passes request validation but blows up inside the model
    (wrong channel count) is a server-side fault → 500, not 400."""
    _, _, base = server
    bad = np.zeros((N_POINTS, N_CH + 3), np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(base, "/v1/classify", _npy_bytes(bad), "application/x-npy")
    assert ei.value.code == 500


def test_unknown_route_is_404(server):
    _, _, base = server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(base + "/v1/nope", timeout=30)
    assert ei.value.code == 404


def test_cli_end_to_end(tmp_path):
    """scripts/serve_http.py on a real trainer checkpoint: boots, answers
    health + classify, shuts down on SIGTERM."""
    from pointvit_tpu.data.synthetic import write_scanobjectnn_h5
    from pointvit_tpu.train import APFTrainer

    root = str(tmp_path / "sonn")
    write_scanobjectnn_h5(root, background=False, num_train=8, num_test=4,
                          num_points=64, num_classes=N_CLASSES)
    model_config = {
        "num_classes": N_CLASSES, "in_channels": N_CH,
        "vit_name": "vit_base_patch16_224", "pretrained": False,
        "embedding_dim": 32, "npoint": 16, "nsample": 8,
        "dropout_rate": 0.0, "dropout_path_rate": 0.0,
        "depth": 2, "num_heads": 4, "bf16": False,
    }
    dataset_config = {
        "root_dir": root, "variant": "main_split", "augmentation": "base",
        "background": False, "use_newsplit": False, "train_num_points": 64,
        "test_num_points": 64, "sampling_method": "fps", "use_height": True,
    }
    train_config = {
        "batch_size": 8, "save_interval": 100, "epochs": 1,
        "label_smoothing": 0.3, "learning_rate": 5e-4, "weight_decay": 5e-2,
        "warmup_epochs": 1, "warmup_lr_init": 1e-3,
    }
    out = str(tmp_path / "apf_out")
    APFTrainer(model_config, dataset_config, train_config,
               output_dir=out).train()
    ckpt = os.path.join(out, "model_best.msgpack")

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # CPU-only child (CLAUDE.md)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "scripts", "serve_http.py"),
         "--checkpoint", ckpt, "--host", "127.0.0.1", "--port", "0",
         "--buckets", "2,4"],
        stdout=subprocess.PIPE, text=True, env=env, cwd=REPO,
    )
    try:
        line = proc.stdout.readline()  # "serving on http://host:port ..."
        assert "serving on http://" in line, line
        port = int(line.split("http://")[1].split()[0].rsplit(":", 1)[1])
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/v1/health", timeout=60) as resp:
            assert json.loads(resp.read())["buckets"] == [2, 4]
        cloud = np.zeros((N_POINTS, N_CH), np.float32)
        status, obj = _post(base, "/v1/classify", _npy_bytes(cloud),
                            "application/x-npy")
        assert status == 200
        assert 0 <= obj["class_id"] < N_CLASSES
        assert len(obj["logits"]) == N_CLASSES
    finally:
        proc.terminate()
        proc.wait(timeout=30)
