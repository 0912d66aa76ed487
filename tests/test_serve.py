"""Serving daemon tests: dynamic batching over the bucket-switch executable
plus the HTTP front-end (unitspeech_tpu/serve.py). The reference has no
serving layer (its inference.py is a one-shot CLI); these lock the scheduling
semantics — batching, grouping, padding, overflow fallback, compile warmup —
on the tiny CPU config."""

import json
import threading
import time
import urllib.error
import urllib.request
import wave

import jax
import numpy as np
import pytest

from unitspeech_tpu.config import (
    DataConfig,
    DecoderConfig,
    DurationPredictorConfig,
    EncoderConfig,
    MainConfig,
    VocoderConfig,
)
from unitspeech_tpu.infer.tts import Synthesizer, TTSModels
from unitspeech_tpu.serve import (
    DynamicBatcher,
    build_batcher,
    encode_wav_bytes,
    make_http_server,
)


def _tiny_synth():
    cfg = MainConfig(
        data=DataConfig(n_feats=16, hop_length=4),
        text_encoder=EncoderConfig(
            n_vocab=40, n_feats=16, n_channels=16, filter_channels=32,
            n_layers=1, n_heads=2,
        ),
        duration_predictor=DurationPredictorConfig(
            in_channels=16, filter_channels=16, spk_emb_dim=8
        ),
        decoder=DecoderConfig(n_feats=16, dim=8, dim_mults=(1, 2), groups=4,
                              spk_emb_dim=8),
        vocoder=VocoderConfig(
            num_mels=16, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
            upsample_initial_channel=16, resblock_kernel_sizes=(3,),
            resblock_dilation_sizes=((1, 3),),
        ),
    )
    models = TTSModels.random_init(cfg, jax.random.PRNGKey(0))
    return Synthesizer(models)


@pytest.fixture(scope="module")
def batcher():
    rng = np.random.default_rng(0)
    texts = [list(rng.integers(1, 39, (8,))) for _ in range(8)]
    voices = {name: rng.standard_normal(8) for name in ("alice", "bob")}
    b = build_batcher(
        _tiny_synth(), calibration_texts=texts, max_batch=4,
        max_wait_ms=300.0, warmup_token_lengths=(8,),
        default_steps=2, text_gradient_scale=0.0, spk_gradient_scale=0.0,
        voices=voices,
    )
    yield b
    b.shutdown()


def test_single_request_roundtrip(batcher):
    wav, sr = batcher.submit([3, 1, 4, 1, 5]).result(timeout=60)
    assert sr == 22050
    assert wav.ndim == 1 and wav.shape[0] % 4 == 0  # hop_length=4
    assert np.isfinite(wav).all()


def test_concurrent_requests_batch_together(batcher):
    """Requests queued inside the wait window must ride ONE dispatch."""
    before = batcher.stats.batches
    futs = [batcher.submit([1 + i, 5, 9, 2]) for i in range(4)]
    outs = [f.result(timeout=60) for f in futs]
    assert all(np.isfinite(w).all() and w.shape[0] > 0 for w, _ in outs)
    made = batcher.stats.batches - before
    # all 4 arrived within max_wait of the head: at most 2 dispatches, and
    # at least one of them carried multiple requests
    assert made <= 2
    assert max(batcher.stats.batch_sizes) >= 2


def test_partial_batch_pads_with_repeat_rows(batcher):
    """3 requests on a {1,2,4} ladder pad to 4 with repeated real rows —
    every real request still gets a valid, finite waveform."""
    futs = [batcher.submit([2, 4, 6, 8]) for _ in range(3)]
    outs = [f.result(timeout=60) for f in futs]
    assert len(outs) == 3
    for w, sr in outs:
        assert sr == 22050 and w.shape[0] > 0 and np.isfinite(w).all()


def test_stats_recent_frames_ring(batcher):
    """Every served request records its resolved frame length in the stats
    ring — the live traffic distribution tools/analyze_buckets.py consumes
    to re-evaluate the bucket window."""
    wav, _ = batcher.submit([7, 3, 2, 8]).result(timeout=60)
    assert wav.shape[0] > 0
    snap = batcher.stats.snapshot()
    frames = snap["recent_frames"]
    assert frames and all(isinstance(x, int) and x > 0 for x in frames)
    # hop_length=4: the last entry matches the request we just served
    assert frames[-1] * 4 >= wav.shape[0]
    # the encoder-side axis rides the same ring: one token count per
    # request, the last being the 4-token request above
    toks = snap["recent_tokens"]
    assert len(toks) == len(frames) and toks[-1] == 4


def test_refresh_window_from_served_traffic():
    """refresh_window: the served length distribution (stats ring) drives a
    cost-model re-derivation and an atomic hot swap; serving continues on
    the new window; guards (min_samples, unchanged, min_gain) hold."""
    rng = np.random.default_rng(5)
    texts = [list(rng.integers(1, 39, (6,))) for _ in range(8)]
    b = build_batcher(
        _tiny_synth(), calibration_texts=texts, max_batch=2,
        warmup_token_lengths=(8,), default_steps=2,
        text_gradient_scale=0.0, spk_gradient_scale=0.0,
    )
    try:
        # not enough traffic yet
        d = b.refresh_window(min_samples=4)
        assert d["refreshed"] is False and "served lengths" in d["reason"]

        # serve a bimodal load: short requests + one much longer one
        futs = [b.submit(list(rng.integers(1, 39, (4,)))) for _ in range(5)]
        futs.append(b.submit(list(rng.integers(1, 39, (30,)))))
        for f in futs:
            f.result(timeout=120)
        assert len(b.stats.recent_frames) == 6

        old = tuple(b.synth.switch_buckets)
        d = b.refresh_window(policy="cost", min_samples=4, max_branches=3)
        assert d["n_lengths"] == 6
        # the served token distribution feeds the absolute predictions
        # (here all requests are far below the curves' tok256 anchor, so
        # the encoder delta is negative)
        assert d["token_cost_ms"] < 0.0
        if d["refreshed"]:
            assert tuple(b.synth.switch_buckets) == tuple(d["window"])
            assert b.stats.window_refreshes == 1
        else:  # already optimal for this load
            assert d["reason"] == "window unchanged"
            assert tuple(b.synth.switch_buckets) == old
        # serving still works on whatever window is live
        wav, sr = b.submit([3, 1, 4]).result(timeout=120)
        assert sr == 22050 and wav.shape[0] > 0 and np.isfinite(wav).all()

        # an impossible gain bar never swaps
        d2 = b.refresh_window(policy="cost", min_samples=4, min_gain=10.0)
        assert d2["refreshed"] is False

        with pytest.raises(ValueError):
            b.refresh_window(policy="nonsense", min_samples=1)
    finally:
        b.shutdown()


def test_refresh_window_http_endpoint(batcher):
    """POST /refresh_window rides the HTTP front-end and /stats reports the
    live window."""
    srv = make_http_server(batcher, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        # serve one request so the ring has data
        wav, _ = batcher.submit([5, 2, 7]).result(timeout=60)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/refresh_window",
            json.dumps({"policy": "cost", "min_samples": 1}).encode(),
            {"Content-Type": "application/json"})
        d = json.loads(urllib.request.urlopen(req, timeout=120).read())
        assert "refreshed" in d and "window" in d
        stats = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30).read())
        assert stats["switch_buckets"] == [
            int(x) for x in batcher.synth.switch_buckets
        ]
        # bad policy is a client error
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/refresh_window",
            json.dumps({"policy": "bogus", "min_samples": 1}).encode(),
            {"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        srv.shutdown()


def test_build_batcher_cost_policy():
    """bucket_policy="cost" rides the startup flow: the window comes from
    the measured cost model (infer/bucket_cost.py) at the batcher's default
    (sampler, steps) price and serves end-to-end."""
    rng = np.random.default_rng(1)
    texts = [list(rng.integers(1, 39, (int(rng.integers(4, 10)),)))
             for _ in range(8)]
    b = build_batcher(
        _tiny_synth(), calibration_texts=texts, max_batch=2,
        warmup_token_lengths=(8,), default_steps=2, bucket_policy="cost",
        text_gradient_scale=0.0, spk_gradient_scale=0.0,
    )
    try:
        w = b.synth.switch_buckets
        # max_branches default 3 + the cost policy's one insurance branch
        assert w is not None and 1 <= len(w) <= 4
        assert tuple(sorted(w)) == tuple(w)
        wav, sr = b.submit([3, 1, 4]).result(timeout=60)
        assert sr == 22050 and wav.shape[0] > 0 and np.isfinite(wav).all()
    finally:
        b.shutdown()


def test_sampler_groups_never_mix(batcher):
    """steps/sampler are static argnames of the switch executable: mixed
    submissions must partition into per-(steps, sampler) batches."""
    before_b = batcher.stats.batches
    futs_a = [batcher.submit([1, 2, 3]) for _ in range(2)]
    futs_b = [batcher.submit([1, 2, 3], sampler="dpm2", steps=2)
              for _ in range(2)]
    outs = [f.result(timeout=120) for f in futs_a + futs_b]
    assert all(np.isfinite(w).all() for w, _ in outs)
    assert batcher.stats.batches - before_b >= 2  # one per group at least


def test_serving_grid_warm_no_new_compiles(batcher):
    """After build_batcher's warmup, requests inside the warmed grid must
    not trigger a compile (the serving guarantee warmup exists for)."""
    from unitspeech_tpu.infer import tts as tts_mod

    n_before = tts_mod._synthesize_bucket_switch._cache_size()
    futs = [batcher.submit([7, 7, 7]) for _ in range(4)]
    for f in futs:
        f.result(timeout=60)
    assert tts_mod._synthesize_bucket_switch._cache_size() == n_before


def test_overflow_falls_back_to_correct_length():
    """A request overflowing the switch window must still synthesize at its
    true (unclamped) length via the batched fallback dispatch."""
    import dataclasses as dc

    synth = _tiny_synth()
    # probe the true length of a long request (length_scale inflates the
    # predicted durations past the smallest ladder buckets), then pick a
    # window BELOW it
    _, y_len, _ = synth.synthesize_mel(
        [1] * 12, jax.random.PRNGKey(0), diffusion_steps=2, length_scale=8.0,
        text_gradient_scale=0.0, spk_gradient_scale=0.0,
    )
    below = [b for b in synth.frame_buckets if b < y_len]
    assert below, "tiny request too short to overflow any bucket"
    synth = dc.replace(synth, switch_buckets=(below[-1],))
    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=5.0, default_steps=2,
                       length_scale=8.0,
                       text_gradient_scale=0.0, spk_gradient_scale=0.0)
    try:
        wav, _sr = b.submit([1] * 12).result(timeout=120)
        hop = synth.models.cfg.data.hop_length
        assert wav.shape[0] == y_len * hop  # NOT clamped to the window
        assert b.stats.overflows >= 1
    finally:
        b.shutdown()


def test_submit_rejects_empty_and_after_shutdown():
    import dataclasses as dc

    synth = _tiny_synth()
    synth = dc.replace(synth, switch_buckets=(synth.frame_buckets[2],))
    b = DynamicBatcher(synth, max_batch=1, max_wait_ms=1.0, default_steps=2,
                       text_gradient_scale=0.0, spk_gradient_scale=0.0)
    with pytest.raises(ValueError):
        b.submit([])
    b.shutdown()
    with pytest.raises(RuntimeError):
        b.submit([1, 2])


def test_encode_wav_bytes_roundtrip():
    wav = np.sin(np.linspace(0, 40, 400)).astype(np.float32) * 0.5
    blob = encode_wav_bytes(wav, 22050)
    with wave.open(__import__("io").BytesIO(blob)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert pcm.shape[0] == 400
    np.testing.assert_allclose(pcm / 32767.0, wav, atol=1e-4)


# -- HTTP front-end -----------------------------------------------------------


@pytest.fixture(scope="module")
def http_server(batcher):
    srv = make_http_server(
        batcher, port=0,
        text_to_ids=lambda s: [1 + (ord(c) % 38) for c in s.strip() or "a"],
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/synthesize", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, r.headers.get("Content-Type"), r.read()
    except urllib.error.HTTPError as e:
        return e.code, e.headers.get("Content-Type"), e.read()


def test_http_synthesize_wav(http_server):
    code, ctype, body = _post(http_server, {"token_ids": [3, 1, 4, 1]})
    assert code == 200 and ctype == "audio/wav"
    with wave.open(__import__("io").BytesIO(body)) as w:
        assert w.getframerate() == 22050
        assert w.getnframes() > 0


def test_http_synthesize_json_and_text(http_server):
    code, ctype, body = _post(
        http_server, {"text": "hello", "format": "json"}
    )
    assert code == 200 and ctype == "application/json"
    payload = json.loads(body)
    assert payload["sr"] == 22050 and payload["n_samples"] > 0
    import base64

    blob = base64.b64decode(payload["wav_base64"])
    with wave.open(__import__("io").BytesIO(blob)) as w:
        assert w.getnframes() == payload["n_samples"]


def test_http_rejects_bad_requests(http_server):
    code, _, body = _post(http_server, {})
    assert code == 400 and b"token_ids or text" in body
    code, _, _ = _post(http_server, {"token_ids": [1], "sampler": "euler"})
    assert code == 400


def test_http_health_and_stats(http_server):
    with urllib.request.urlopen(http_server + "/healthz", timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    with urllib.request.urlopen(http_server + "/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 1 and stats["batches"] >= 1
    assert stats["mean_latency_s"] >= 0.0


def test_http_rejects_non_object_body_and_bad_types(http_server):
    # JSON list body -> 400 (not a 500 from AttributeError)
    code, _, body = _post(http_server, [1, 2, 3])
    assert code == 400 and b"JSON object" in body
    # token_ids of the wrong type -> 400
    code, _, _ = _post(http_server, {"token_ids": 5})
    assert code == 400
    code, _, _ = _post(http_server, {"token_ids": [1], "steps": "soon"})
    assert code == 400


def test_sampler_spec_normalization():
    """Equivalent specs ('ddpm' / 'ddpm:cs1') must share one batch group —
    distinct groups would compile duplicate executables and split batches."""
    from unitspeech_tpu.serve import _normalize_sampler_spec, _Request, Future

    assert _normalize_sampler_spec("ddpm:cs1") == "ddpm"
    assert _normalize_sampler_spec("dpm2:cs2") == "dpm2:cs2"
    with pytest.raises(ValueError):
        _normalize_sampler_spec("euler")
    a = _Request([1], 2, _normalize_sampler_spec("ddpm"), Future(), 0.0)
    b = _Request([1], 2, _normalize_sampler_spec("ddpm:cs1"), Future(), 0.0)
    assert a.group_key == b.group_key


def test_strict_grid_rejects_unwarmed():
    """strict_grid=True: anything outside the warmed compile grid is a
    client error, never a lazy compile on the dispatcher thread."""
    import dataclasses as dc

    rng = np.random.default_rng(0)
    texts = [list(rng.integers(1, 39, (8,))) for _ in range(8)]
    b = build_batcher(
        _tiny_synth(), calibration_texts=texts, max_batch=2,
        max_wait_ms=5.0, warmup_token_lengths=(8,),
        default_steps=2, text_gradient_scale=0.0, spk_gradient_scale=0.0,
        strict_grid=True,
    )
    try:
        # the warmed configuration still serves
        wav, _sr = b.submit([1, 2, 3]).result(timeout=120)
        assert wav.shape[0] > 0
        # non-default steps -> rejected at submit (client error)
        with pytest.raises(ValueError, match="not.*warmed|warmed"):
            b.submit([1, 2, 3], steps=7)
        with pytest.raises(ValueError):
            b.submit([1, 2, 3], sampler="dpm2")
        # tokens beyond the warmed bucket ceiling -> rejected
        with pytest.raises(ValueError, match="tokens exceeds"):
            b.submit([1] * (b._warmed_max_tokens + 1))
    finally:
        b.shutdown()


def test_strict_grid_overflow_rejected_not_compiled():
    """strict_grid: a frame-window overflow fails the request with a clear
    error instead of lazily compiling the fallback executable."""
    import dataclasses as dc

    synth = _tiny_synth()
    _, y_len, _ = synth.synthesize_mel(
        [1] * 12, jax.random.PRNGKey(0), diffusion_steps=2, length_scale=8.0,
        text_gradient_scale=0.0, spk_gradient_scale=0.0,
    )
    below = [b for b in synth.frame_buckets if b < y_len]
    assert below, "tiny request too short to overflow any bucket"
    synth = dc.replace(synth, switch_buckets=(below[-1],))
    b = DynamicBatcher(synth, max_batch=2, max_wait_ms=5.0, default_steps=2,
                       length_scale=8.0, strict_grid=True,
                       text_gradient_scale=0.0, spk_gradient_scale=0.0)
    # mark the default group warmed without running the (slow) full warmup
    b._warmed_groups.add((b.default_steps, b.default_sampler))
    b._warmed_max_tokens = 64
    try:
        with pytest.raises(RuntimeError, match="overflowed the switch"):
            b.submit([1] * 12).result(timeout=120)
        assert b.stats.overflows >= 1
    finally:
        b.shutdown()


def test_split_sentences():
    from unitspeech_tpu.text import split_sentences

    assert split_sentences("One. Two! Three?") == ["One.", "Two!", "Three?"]
    # single-word fragments merge (abbreviation oversplits)
    assert split_sentences("U. S. economy grew. It did.") == [
        "U. S. economy grew.", "It did."
    ]
    # run-ons split at clause punctuation under the word budget
    long = " ".join(f"w{i}," if i % 7 == 6 else f"w{i}" for i in range(100))
    parts = split_sentences(long, max_words=30)
    assert all(len(p.split()) <= 30 for p in parts)
    assert " ".join(parts).split() == long.split()  # nothing lost
    assert split_sentences("") == []
    assert split_sentences("no terminal punctuation") == [
        "no terminal punctuation"
    ]


def test_http_long_text_split(http_server):
    """split:true — sentence chunks ride the batcher as one batch and the
    concatenated wav comes back as a single response."""
    code, ctype, one = _post(http_server, {"text": "hello.", "format": "json"})
    assert code == 200
    n_one = json.loads(one)["n_samples"]
    code, ctype, body = _post(
        http_server,
        {"text": "hello. hello there. hello again!", "split": True,
         "format": "json"},
    )
    assert code == 200, body
    payload = json.loads(body)
    # three chunks concatenated: strictly longer than any single one
    assert payload["n_samples"] > n_one
    import base64

    with wave.open(__import__("io").BytesIO(
            base64.b64decode(payload["wav_base64"]))) as w:
        assert w.getnframes() == payload["n_samples"]


def test_solo_request_never_batched(batcher):
    """solo=True must dispatch alone (batch size 1) even with compatible
    requests queued around it — the streaming mode's first-chunk latency
    guarantee."""
    before_ones = batcher.stats.batch_sizes.get(1, 0)
    f0 = batcher.submit([9, 8, 7], solo=True)
    rest = [batcher.submit([9, 8, 7]) for _ in range(3)]
    outs = [f.result(timeout=60) for f in [f0] + rest]
    assert all(np.isfinite(w).all() and w.shape[0] > 0 for w, _ in outs)
    # the solo request was a size-1 dispatch; its 3 companions were free to
    # pack together (they never absorbed the solo row)
    assert batcher.stats.batch_sizes.get(1, 0) >= before_ones + 1


def test_http_stream_long_text(http_server):
    """stream:true — chunked audio/wav whose PCM matches the non-streaming
    split response sample-for-sample count (durations are deterministic)."""
    import struct

    text = "hello there. how are you. fine thanks!"
    code, _, body = _post(
        http_server, {"text": text, "split": True, "format": "json"}
    )
    assert code == 200, body
    n_ref = json.loads(body)["n_samples"]

    req = urllib.request.Request(
        http_server + "/synthesize",
        data=json.dumps({"text": text, "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        assert r.headers.get("Content-Type") == "audio/wav"
        assert r.headers.get("Transfer-Encoding") == "chunked"
        header = r.read(44)  # RIFF header rides the FIRST chunk
        pcm = r.read()
    assert header[:4] == b"RIFF" and header[8:12] == b"WAVE"
    # live-stream convention: unknown RIFF/data sizes
    assert struct.unpack("<I", header[4:8])[0] == 0xFFFFFFFF
    assert struct.unpack("<I", header[40:44])[0] == 0xFFFFFFFF
    sr = struct.unpack("<I", header[24:28])[0]
    assert sr == 22050
    assert len(pcm) == 2 * n_ref  # 16-bit mono: every chunk arrived, in full
    assert np.isfinite(
        np.frombuffer(pcm, "<i2").astype(np.float32)
    ).all()


def test_http_stream_single_request(http_server):
    """stream:true with token_ids — a one-chunk stream (header + PCM +
    terminal chunk) is still a valid response."""
    req = urllib.request.Request(
        http_server + "/synthesize",
        data=json.dumps({"token_ids": [2, 7, 1, 8], "stream": True}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.status == 200
        body = r.read()
    assert body[:4] == b"RIFF"
    assert len(body) > 44 and (len(body) - 44) % 2 == 0


def test_multi_voice_batch(batcher):
    """Named voices are per-row conditioning of the same executable: mixed
    speakers pack into one batch and produce speaker-dependent audio."""
    toks = [5, 4, 3, 2]
    futs = [batcher.submit(toks),
            batcher.submit(toks, speaker="alice"),
            batcher.submit(toks, speaker="bob")]
    outs = [f.result(timeout=60) for f in futs]
    assert all(np.isfinite(w).all() and w.shape[0] > 0 for w, _ in outs)
    # same tokens + same batch key, different spk rows: the conditioning
    # must actually reach the decoder/duration path
    w_def, w_alice, w_bob = (o[0] for o in outs)
    assert (w_alice.shape != w_bob.shape
            or not np.allclose(w_alice, w_bob))
    assert (w_def.shape != w_alice.shape
            or not np.allclose(w_def, w_alice))


def test_unknown_speaker_rejected(batcher):
    with pytest.raises(ValueError, match="unknown speaker"):
        batcher.submit([1, 2, 3], speaker="nobody")


def test_http_speaker_param(http_server):
    code, _, body = _post(
        http_server, {"text": "hi there", "speaker": "alice",
                      "format": "json"}
    )
    assert code == 200, body
    assert json.loads(body)["n_samples"] > 0
    code, _, body = _post(http_server, {"text": "hi", "speaker": "nobody"})
    assert code == 400 and b"unknown speaker" in body
    code, _, _ = _post(http_server, {"text": "hi", "speaker": 3})
    assert code == 400


def test_queue_backpressure_503():
    """At max_queue pending requests submit() sheds load with Overloaded;
    the HTTP layer maps it to 503 + Retry-After."""
    import dataclasses as dc

    from unitspeech_tpu.serve import Overloaded

    synth = _tiny_synth()
    synth = dc.replace(synth, switch_buckets=(synth.frame_buckets[2],))
    b = DynamicBatcher(synth, max_batch=1, max_wait_ms=1.0, default_steps=2,
                       text_gradient_scale=0.0, spk_gradient_scale=0.0,
                       max_queue=2)
    gate, entered = threading.Event(), threading.Event()
    inner = b._dispatch
    b._dispatch = lambda batch: (entered.set(), gate.wait(30),
                                 inner(batch))[2]
    try:
        # head is popped by the dispatcher (blocked in _dispatch), then two
        # fill the queue to max_queue; the fourth must be rejected
        futs = [b.submit([1, 2, 3])]
        assert entered.wait(30)  # head is OUT of the queue, dispatch blocked
        futs += [b.submit([1, 2, 3]) for _ in range(2)]
        with pytest.raises(Overloaded, match="queue full"):
            b.submit([1, 2, 3])
        assert b.stats.rejected == 1
        gate.set()
        for f in futs:
            assert f.result(timeout=120)[0].shape[0] > 0
    finally:
        gate.set()
        b.shutdown()

    # HTTP mapping: a server over a saturated batcher returns 503
    b2 = DynamicBatcher(synth, max_batch=1, max_wait_ms=1.0, default_steps=2,
                        text_gradient_scale=0.0, spk_gradient_scale=0.0,
                        max_queue=0)
    srv = make_http_server(b2, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        code, _, body = _post(url, {"token_ids": [1, 2]})
        assert code == 503 and b"queue full" in body
    finally:
        srv.shutdown()
        b2.shutdown()


def test_stats_padding_and_dispatch(batcher):
    """padding_waste and mean_dispatch_s expose batch-packing efficiency —
    3 requests on the {1,2,4} ladder pad one row."""
    base = batcher.stats
    before_real, before_pad = base.real_rows, base.padded_rows
    futs = [batcher.submit([6, 6, 6]) for _ in range(3)]
    for f in futs:
        f.result(timeout=60)
    snap = batcher.stats.snapshot()
    assert batcher.stats.real_rows - before_real == 3
    assert batcher.stats.padded_rows >= before_pad  # ladder may pad
    assert snap["mean_dispatch_s"] > 0.0
    assert 0.0 <= snap["padding_waste"] < 1.0
