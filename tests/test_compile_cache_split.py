"""Split-storage round trip for oversized compile-cache entries.

The compile cache is committed to git (CLAUDE.md: disk wiped between
rounds); the repo's policy caps committed files at 100 MB, and
utils/compile_cache stores larger entries as .__partN chunks rejoined at
enable time."""

import os

from miccai24_immoco_tpu.utils import compile_cache as cc


def test_split_rejoin_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setattr(cc, "SPLIT_BYTES", 1024)
    d = str(tmp_path)
    big = os.path.join(d, "jit_big-entry-cache")
    payload = os.urandom(1024 * 3 + 17)
    with open(big, "wb") as f:
        f.write(payload)
    small = os.path.join(d, "jit_small-entry-cache")
    with open(small, "wb") as f:
        f.write(b"tiny")

    done = cc.split_large_entries(d)
    assert done == ["jit_big-entry-cache"]
    assert not os.path.exists(big)
    parts = sorted(p for p in os.listdir(d) if cc.SPLIT_SUFFIX in p)
    assert len(parts) == 4  # 3 full chunks + 17-byte tail
    # small entry untouched
    assert os.path.getsize(small) == 4

    cc._rejoin_split_entries(d)
    with open(big, "rb") as f:
        assert f.read() == payload
    # Idempotent: a second rejoin with the joined file present is a no-op.
    mtime = os.path.getmtime(big)
    cc._rejoin_split_entries(d)
    assert os.path.getmtime(big) == mtime
    # The rejoined original is gitignored so the tree stays clean.
    with open(os.path.join(d, ".gitignore")) as f:
        lines = {l.strip() for l in f}
    assert "jit_big-entry-cache" in lines


def test_rejoin_handles_partial_join(tmp_path, monkeypatch):
    """A stale/truncated joined file is rebuilt from the chunks."""
    monkeypatch.setattr(cc, "SPLIT_BYTES", 1024)
    d = str(tmp_path)
    big = os.path.join(d, "jit_entry-cache")
    payload = os.urandom(2048)
    with open(big, "wb") as f:
        f.write(payload)
    cc.split_large_entries(d)
    with open(big, "wb") as f:
        f.write(b"truncated")
    cc._rejoin_split_entries(d)
    with open(big, "rb") as f:
        assert f.read() == payload
