"""Top-level CLI argument routing (no models built: build_session stubbed).

The live end-to-end behavior of the CLI is covered by the RUN_E2E pipeline
test and by driving it against ``/root/reference/examples``; these tests pin
the argument plumbing — reference ``sketchyscene_colorization_main.py:58-112``
plus the ``--instructions`` stream extension.
"""
import os
import sys

import pytest

from sketchyscenecolorization_tpu import cli


class _StubSession:
    def __init__(self):
        self.calls = []

    def colorize(self, image_id, text):
        self.calls.append(("colorize", image_id, text))
        return f"/out/{image_id}_{len(self.calls)}.png"

    def colorize_stream(self, image_id, texts):
        self.calls.append(("stream", image_id, list(texts)))
        return [f"/out/{image_id}_{i}.png" for i in range(len(texts))]

    def flush(self):
        self.calls.append(("flush",))


@pytest.fixture
def stub(monkeypatch):
    session = _StubSession()
    monkeypatch.setattr(cli, "build_session", lambda cfg, seed: session)
    return session


def test_single_instruction_calls_colorize(stub, capsys):
    assert cli.main(["--command", "color", "--image_id", "7",
                     "--instruction", "the bus is yellow"]) == 0
    # colorize then flush: the record commits before the PNG may have left a
    # write-behind queue, so the CLI drains the writer before exiting
    assert stub.calls == [("colorize", 7, "the bus is yellow"), ("flush",)]
    assert "saved: /out/7_1.png" in capsys.readouterr().out


def test_instructions_queue_routes_through_stream(stub, capsys):
    assert cli.main(["--command", "color", "--image_id", "7",
                     "--instructions",
                     " the bus is yellow ;; the sky is blue ; "]) == 0
    # split on ';', whitespace/empties dropped, one stream call, then flush
    assert stub.calls == [
        ("stream", 7, ["the bus is yellow", "the sky is blue"]),
        ("flush",),
    ]
    out = capsys.readouterr().out
    assert out.count("saved: ") == 2


def test_color_requires_some_instruction(stub):
    with pytest.raises(SystemExit):
        cli.main(["--command", "color", "--image_id", "7"])


def test_image_id_required():
    with pytest.raises(SystemExit):
        cli.main(["--command", "color", "--instruction", "x"])


def test_enable_persistent_compilation_cache(tmp_path, monkeypatch):
    """Explicit path wins, env is honored, dir is created, jax config set."""
    import jax
    from sketchyscenecolorization_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)
    prev = jax.config.jax_compilation_cache_dir
    try:
        p = str(tmp_path / "cc_explicit")
        assert enable_persistent_compilation_cache(p) == p
        assert os.path.isdir(p)
        assert jax.config.jax_compilation_cache_dir == p
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR",
                           str(tmp_path / "cc_env"))
        assert enable_persistent_compilation_cache() == \
            str(tmp_path / "cc_env")
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
