"""Foundation tests: charset round-trip, CTC greedy decode, CER/WER goldens."""

import numpy as np
import pytest

from handwriting_line_generation_tpu.charset import (
    IAM_CHARSET, RIMES_CHARSET, Charset, ctc_greedy_decode,
)
from handwriting_line_generation_tpu.utils.error_rates import cer, levenshtein, wer


def test_charset_sizes():
    # num_class 80 / 78 as in the reference configs
    # (configs/cf_IAMslant_...sMG.json "num_class": 80).
    assert IAM_CHARSET.num_class == 80
    assert RIMES_CHARSET.num_class == 78


def test_charset_roundtrip():
    text = 'The "quick" brown fox; jumps 42 #7!'
    label = IAM_CHARSET.encode(text)
    assert IAM_CHARSET.decode(label) == text


def test_charset_drops_unknown():
    # str2label_single drops chars outside the set (string_utils.py:9-11).
    assert IAM_CHARSET.decode(IAM_CHARSET.encode("a~b")) == "ab"


def test_charset_json_roundtrip(tmp_path):
    path = str(tmp_path / "cs.json")
    IAM_CHARSET.save(path)
    loaded = Charset.load(path)
    assert loaded.chars == IAM_CHARSET.chars


def test_ctc_greedy_decode():
    # raw argmax path: a a blank a b b -> "a a b" collapsed to [a, a, b]
    num_class = 4
    seq = [1, 1, 0, 1, 2, 2]
    logits = np.full((len(seq), num_class), -5.0)
    for t, c in enumerate(seq):
        logits[t, c] = 5.0
    assert ctc_greedy_decode(logits) == [1, 1, 2]


def test_levenshtein_matches_bruteforce():
    rs = np.random.default_rng(1)
    for _ in range(50):
        a = "".join(rs.choice(list("abcd"), size=rs.integers(0, 12)))
        b = "".join(rs.choice(list("abcd"), size=rs.integers(0, 12)))
        assert levenshtein(a, b) == _slow_lev(a, b), (a, b)


def _slow_lev(a, b):
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(len(a) + 1):
        dp[i][0] = i
    for j in range(len(b) + 1):
        dp[0][j] = j
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = min(dp[i - 1][j] + 1, dp[i][j - 1] + 1,
                           dp[i - 1][j - 1] + (a[i - 1] != b[j - 1]))
    return dp[-1][-1]


def test_cer_whitespace_normalized():
    # double/trailing whitespace removed before comparing (error_rates.py:7-8)
    assert cer("a  b ", "a b") == 0.0
    assert cer("abc", "abd") == pytest.approx(1 / 3)
    assert cer("ABC", "abc", casesensitive=False) == 0.0


def test_wer():
    assert wer("the quick fox", "the slow fox") == pytest.approx(1 / 3)
    assert wer("", "word") == 1.0


def test_native_imageops_matches_opencv():
    """native/imageops.c resize_norm tracks cv2 INTER_CUBIC + normalize
    within u8 rounding; pack_batch bit-exact vs numpy fill+assign."""
    pytest.importorskip("cv2")
    import cv2
    try:
        from handwriting_line_generation_tpu.utils._imageops import (
            pack_batch, resize_norm)
    except ImportError:
        pytest.skip("libimageops.so not built (make -C native)")
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (61, 203), np.uint8)
    ours = resize_norm(src, 64, 160)
    ref = 1.0 - cv2.resize(src, (160, 64),
                           interpolation=cv2.INTER_CUBIC).astype(
        np.float32) / 128.0
    assert np.abs(ours - ref).max() < 0.06

    imgs = [rng.standard_normal((16, w)).astype(np.float32)
            for w in (5, 12, 16)]
    packed = pack_batch(imgs, 16, -1.0)
    expect = np.full((3, 16, 16), -1.0, np.float32)
    for i, im in enumerate(imgs):
        expect[i, :, :im.shape[1]] = im
    np.testing.assert_array_equal(packed, expect)


def test_form_decode_cache(tmp_path):
    """_imread_gray caches per path and returns read-only arrays."""
    pytest.importorskip("cv2")
    import cv2
    from handwriting_line_generation_tpu.data.datasets import _imread_gray
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, np.zeros((8, 8), np.uint8))
    a = _imread_gray(p)
    b = _imread_gray(p)
    assert a is b and not a.flags.writeable


def test_acquire_watchdog(monkeypatch):
    """Device-acquisition watchdog (utils/acquire.py): CPU runs no-op, a
    live probe passes, and a wedged probe re-execs the same argv with the
    retry counter bumped (the axon tunnel race observed live in round 4)."""
    import os
    import time

    from handwriting_line_generation_tpu.utils import acquire

    # pinned to CPU -> no tunnel to race -> immediate True
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert acquire.ensure_device_or_reexec(_probe=lambda: 1 / 0)

    # probe answers within the deadline -> True, no exec
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    assert acquire.ensure_device_or_reexec(timeout=5.0, _probe=lambda: None)

    # probe wedges -> settle + execv(same argv), ACQ_REEXEC bumped
    import threading
    wedge = threading.Event()   # never set: the probe blocks like a wedged
    calls = {}                  # tunnel acquisition
    monkeypatch.setattr(acquire.os, "execv",
                        lambda exe, argv: calls.update(exe=exe, argv=argv))
    monkeypatch.setattr(acquire.time, "sleep", lambda s: None)
    monkeypatch.delenv("ACQ_REEXEC", raising=False)
    acquire.ensure_device_or_reexec(timeout=0.1, _probe=wedge.wait)
    assert calls["argv"][1:] == list(acquire.sys.argv)
    assert os.environ["ACQ_REEXEC"] == "1"

    # budget exhausted -> hard exit, no exec loop
    monkeypatch.setenv("ACQ_REEXEC", "20")
    monkeypatch.setattr(acquire.os, "_exit",
                        lambda code: calls.update(exit=code))
    calls.pop("argv")
    acquire.ensure_device_or_reexec(timeout=0.1, max_tries=20,
                                    _probe=wedge.wait)
    assert calls["exit"] == 1 and "argv" not in calls
    wedge.set()  # unblock the two daemon probe threads


def test_completion_guard(monkeypatch):
    """Heartbeat guard (utils/acquire.py): the tunnel wedge can strike any
    dispatch after acquisition — the first big compile RPC, or (round-4
    forensics) a later step in a process that had already made progress.
    Every log entry beats the guard; a gap longer than the timeout settles,
    re-checks for late progress, and re-execs."""
    import threading
    import time

    from handwriting_line_generation_tpu.utils import acquire

    # pinned to CPU -> no-op guard (both APIs)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    g = acquire.arm_completion_guard(timeout=0.0)
    g.beat(), g.disarm(), g()

    monkeypatch.setenv("JAX_PLATFORMS", "axon")

    # disarmed before the deadline -> the watcher never re-execs (legacy
    # callable-disarm form still works)
    fired = threading.Event()
    disarm = acquire.arm_completion_guard(
        timeout=5.0, _reexec=lambda *a: fired.set())
    disarm()
    assert not fired.wait(timeout=0.3)

    # milestone never reached -> re-exec path runs with the guard's own
    # retry counter key, after the settle re-check
    hit = {}
    done = threading.Event()

    def fake_reexec(env_key, max_tries, settle, reason):
        hit.update(env_key=env_key, reason=reason)
        done.set()

    acquire.arm_completion_guard(timeout=0.05, settle=0.01,
                                 _reexec=fake_reexec)
    assert done.wait(timeout=5.0)
    assert hit["env_key"] == "ACQ_GUARD_REEXEC"
    assert "wedged tunnel RPC" in hit["reason"]

    # heartbeats keep a healthy-but-long run alive across many deadline
    # windows (the round-4 one-shot guard had no coverage here)...
    refired = threading.Event()
    g = acquire.arm_completion_guard(timeout=0.6, settle=0.01,
                                     _reexec=lambda *a: refired.set())
    for _ in range(8):
        time.sleep(0.05)
        g.beat()
    assert not refired.is_set()
    # ...and a stall AFTER real progress still trips the guard
    assert refired.wait(timeout=10.0)

    # the first milestone (cold-compile window) gets its own longer
    # deadline: no fire inside first_timeout even with zero beats, but the
    # tight steady-state timeout takes over after the first beat
    first = threading.Event()
    g1 = acquire.arm_completion_guard(timeout=0.1, first_timeout=1.2,
                                      settle=0.01,
                                      _reexec=lambda *a: first.set())
    assert not first.wait(timeout=0.6)   # 6x past `timeout`, still compiling
    g1.beat()                            # first step logged
    assert first.wait(timeout=5.0)       # now the 0.1s heartbeat applies

    # ADVICE r4: progress landing during the settle window aborts the
    # re-exec instead of discarding up to save_every iterations.
    # Timeline: deadline blows ~0.2s -> watcher settles 1.0s (ends ~1.3s);
    # the beat at ~0.5s makes the post-settle re-check continue instead of
    # exec; the next legitimate fire cannot land before 0.5+0.2+1.0=1.7s,
    # so "no fire by 1.45s" isolates the aborted one.
    aborted_fire = threading.Event()
    g2 = acquire.arm_completion_guard(timeout=0.2, settle=1.0,
                                      _reexec=lambda *a: aborted_fire.set())
    time.sleep(0.5)    # let the deadline blow -> watcher enters settle
    g2.beat()          # late progress arrives mid-settle
    assert not aborted_fire.wait(timeout=0.95)
    g2.disarm()
