"""AOT sampler export: artifact == live sampler bit-exactly, self-contained
roundtrip, conditional labels, and the HTTP server end to end."""

import base64
import io
import json
import urllib.request

import jax
import numpy as np
import pytest

from audiogan_tpu.serve import export_sampler, load_sampler, make_server
from audiogan_tpu.train.state import create_train_state

from helpers_train import tiny_config


@pytest.fixture(scope="module")
def art(tmp_path_factory):
    cfg = tiny_config()
    state = create_train_state(cfg)
    d = tmp_path_factory.mktemp("art")
    export_sampler(cfg, state.params_g, num=3, out_dir=d)
    return cfg, state, d


def test_export_matches_live_sampler(art):
    cfg, state, d = art
    sampler = load_sampler(d)
    got = sampler.generate(seed=7)
    assert got.shape == (3, cfg.data.clip_len)

    from audiogan_tpu.train.sample import build_sample_fn
    fn = build_sample_fn(cfg)
    want = np.asarray(fn(state.params_g, jax.random.key(7), num=3))
    # same math, separately jit'd graphs: XLA may fuse differently, so the
    # bar is float-tolerance equality ([B:5]); artifact-vs-artifact is exact
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_export_deterministic_and_seed_sensitive(art):
    _, _, d = art
    s = load_sampler(d)
    np.testing.assert_array_equal(s.generate(3), s.generate(3))
    assert not np.array_equal(s.generate(3), s.generate(4))


def test_export_meta(art):
    cfg, _, d = art
    meta = json.loads((d / "meta.json").read_text())
    assert meta["num"] == 3
    assert meta["sample_rate"] == cfg.data.sample_rate
    assert meta["clip_len"] == cfg.data.clip_len
    assert jax.default_backend() in meta["platforms"]


def test_export_conditional(tmp_path):
    import dataclasses
    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, num_classes=4))
    state = create_train_state(cfg)
    export_sampler(cfg, state.params_g, num=4, out_dir=tmp_path)
    s = load_sampler(tmp_path)
    labels = np.array([0, 1, 2, 3], np.int32)
    got = s.generate(seed=0, labels=labels)

    from audiogan_tpu.train.sample import build_sample_fn
    want = np.asarray(build_sample_fn(cfg)(
        state.params_g, jax.random.key(0), labels, num=4))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)
    with pytest.raises(ValueError, match="shape"):
        s.generate(0, labels=np.array([1, 2], np.int32))


def test_http_server_roundtrip(art):
    cfg, _, d = art
    srv = make_server(load_sampler(d), port=0)
    host, port = srv.server_address[:2]
    import threading
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://{host}:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["num"] == 3

        body = json.dumps({"seed": 5, "num": 2}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/generate", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["num"] == 2 and len(out["wavs"]) == 2

        # the served wav decodes back to the artifact's waveform
        from audiogan_tpu.data.wavio import read_wav
        wav = base64.b64decode(out["wavs"][0])
        import tempfile
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            f.write(wav)
            f.flush()
            rate, x = read_wav(f.name)
        assert rate == cfg.data.sample_rate
        want = load_sampler(d).generate(5)[0]
        want16 = np.clip(np.round(np.clip(want, -1, 1) * 32767), -32768,
                         32767).astype(np.int16) / 32768.0
        np.testing.assert_allclose(x, want16, atol=1.0 / 32768)

        # bad request -> 400 with an error message
        bad = urllib.request.Request(
            f"http://{host}:{port}/generate",
            data=json.dumps({"num": 99}).encode())
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()
        srv.server_close()
