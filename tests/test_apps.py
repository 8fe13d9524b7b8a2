"""End-to-end application smoke tests (reference example.py /
test_lightstage.py workflows, CI-sized)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))


class TestExample:
    def test_texture_recovery(self, tmp_path, monkeypatch):
        monkeypatch.setattr(
            sys, "argv", ["example.py", "--small", "--iters", "10", "--out", str(tmp_path)]
        )
        import example

        mse = example.main()
        # recovered image should be close to GT after a few Adam steps
        assert mse < 0.2, mse
        assert (tmp_path / "diffuse.npy").exists()


class TestLightstage:
    def test_multi_light_recovery(self, monkeypatch):
        monkeypatch.setattr(sys, "argv", ["lightstage.py", "--small"])
        import lightstage

        r = lightstage.main()
        assert r["loss_last"] < 0.8 * r["loss_first"], r
