"""Smoke tests for the repo-root tools (host-only, no device work)."""

import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gif_smoke_writes_artifacts(tmp_path, monkeypatch):
    """tools/smoke_gif.py — the runnable counterpart of the reference
    eval-loader __main__ dump (ucf_dataloader_eval.py:163-187) — must
    produce the orig/flip GIFs and the overlay PNG on the synthetic
    backend."""
    smoke = _load("smoke_gif")
    monkeypatch.setattr(sys, "argv", ["smoke_gif", str(tmp_path), "1"])
    smoke.main()
    for name in ("orig_01_gt.gif", "flip_01_gt.gif", "overlay_01.png"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 0, name
