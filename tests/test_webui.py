"""WebUI logic tests without gradio (VERDICT r2 weak #5 / next #9): the
model discovery, examples parsing and callback plumbing are plain functions;
only create_demo needs gradio (guarded by importorskip so the file can't rot
silently).  Reference surface: webui.py:24-422."""

import json
import os

import pytest

from indextts_tpu.serve import webui


def test_module_imports_without_gradio():
    # the module must be importable in this gradio-less image; only
    # create_demo raises
    assert webui.discover_models is not None
    if webui.gr is None:
        with pytest.raises(ImportError, match="gradio is required"):
            webui.create_demo("x.yaml", "x")


def test_discover_models(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "gpt.pth").write_bytes(b"x")
    (tmp_path / "sub" / "model_epoch_3.pth").write_bytes(b"x")
    (tmp_path / "notes.txt").write_bytes(b"x")
    got = webui.discover_models(str(tmp_path))
    assert got == ["gpt.pth", os.path.join("sub", "model_epoch_3.pth")]


def test_parse_examples(tmp_path):
    p = tmp_path / "cases.jsonl"
    p.write_text(
        json.dumps({"text": "你好。"}) + "\n"
        + "NOT JSON\n"
        + json.dumps({"text": ""}) + "\n"
        + json.dumps({"other": 1}) + "\n"
        + json.dumps({"text": "Second case."}) + "\n",
        encoding="utf-8")
    assert webui.parse_examples(str(p)) == [["你好。"], ["Second case."]]
    assert webui.parse_examples(None) == []
    assert webui.parse_examples(str(tmp_path / "missing.jsonl")) == []


class _StubTokenizer:
    def tokenize(self, text):
        return list(text)

    def split_sentences(self, tokens, max_tokens):
        return [tokens[i:i + max_tokens]
                for i in range(0, len(tokens), max_tokens)]


class _StubEngine:
    """Records engine construction and synthesis calls."""

    instances = []

    def __init__(self, **kwargs):
        self.ctor = kwargs
        self.calls = []
        self.tokenizer = _StubTokenizer()
        self.gr_progress = None
        _StubEngine.instances.append(self)

    def infer_fast(self, prompt, text, out, **kw):
        self.calls.append(("fast", prompt, text, out, kw))
        return out

    def infer(self, prompt, text, out, **kw):
        self.calls.append(("normal", prompt, text, out, kw))
        return out


@pytest.fixture
def callbacks(tmp_path):
    _StubEngine.instances = []
    return webui.build_callbacks("cfg.yaml", "mdir",
                                 engine_factory=_StubEngine,
                                 out_dir=str(tmp_path))


def test_synthesize_arg_plumbing_fast(callbacks, tmp_path):
    out = callbacks["synthesize"](
        "voice.wav", "text here", "fast", 100, 4, True, 0.8, 30, 1.0, 10.0, 600)
    eng = callbacks["state"]["tts"]
    mode, prompt, text, path, kw = eng.calls[0]
    assert (mode, prompt, text) == ("fast", "voice.wav", "text here")
    assert path == os.path.join(str(tmp_path), "webui_gen.wav") == out
    assert kw["sentences_bucket_max_size"] == 4
    assert kw["max_text_tokens_per_sentence"] == 100
    assert kw["top_k"] == 30 and isinstance(kw["top_k"], int)
    assert kw["max_mel_tokens"] == 600 and kw["repetition_penalty"] == 10.0
    # slider defaults for the r3 controls
    assert kw["num_beams"] == 3 and kw["cfg_scale"] == 1.0


def test_synthesize_plumbs_beams_and_guidance(callbacks):
    callbacks["synthesize"](
        "voice.wav", "text", "fast", 100, 4, True, 0.8, 30, 1.0, 10.0, 600,
        num_beams=1, cfg_scale=2.5)
    eng = callbacks["state"]["tts"]
    _, _, _, _, kw = eng.calls[-1]
    assert kw["num_beams"] == 1 and kw["cfg_scale"] == 2.5


def test_synthesize_guidance_overrides_default_beams(callbacks):
    """The UI always carries a num_beams value (slider default 3); with an
    active cfg_scale it must be OMITTED so the engine's sampling-mode
    auto-switch applies the guidance instead of silently decoding unguided
    on the beam path (r3 review)."""
    callbacks["synthesize"](
        "voice.wav", "text", "fast", 100, 4, True, 0.8, 30, 1.0, 10.0, 600,
        num_beams=3, cfg_scale=2.0)
    _, _, _, _, kw = callbacks["state"]["tts"].calls[-1]
    assert "num_beams" not in kw and kw["cfg_scale"] == 2.0
    # inactive guidance: the beam default passes through
    callbacks["synthesize"](
        "voice.wav", "text", "fast", 100, 4, True, 0.8, 30, 1.0, 10.0, 600,
        num_beams=3, cfg_scale=1.0)
    _, _, _, _, kw = callbacks["state"]["tts"].calls[-1]
    assert kw["num_beams"] == 3


def test_synthesize_arg_plumbing_normal(callbacks):
    callbacks["synthesize"](
        "v.wav", "t", "normal", 80, 4, False, 0.9, 50, 0.7, 5.0, 300)
    mode, _, _, _, kw = callbacks["state"]["tts"].calls[0]
    assert mode == "normal"
    assert "sentences_bucket_max_size" not in kw  # normal mode has no buckets
    assert kw["do_sample"] is False and kw["top_p"] == 0.9


def test_reload_model_swaps_engine(callbacks):
    first = callbacks["state"]["tts"]
    msg = callbacks["reload_model"]("finetune/gpt_ft.pth")
    assert "gpt_ft.pth" in msg
    assert callbacks["state"]["tts"] is not first
    assert callbacks["state"]["tts"].ctor["gpt_path"] == "finetune/gpt_ft.pth"
    # empty selection reloads the default
    callbacks["reload_model"]("")
    assert callbacks["state"]["tts"].ctor["gpt_path"] is None


def test_preview_split(callbacks):
    rows = callbacks["preview_split"]("abcdefgh", 3)
    assert rows == [[0, 3, "abc"], [1, 3, "def"], [2, 2, "gh"]]


def test_create_demo_builds_with_gradio():
    gr = pytest.importorskip("gradio")
    del gr  # only reachable in images that ship gradio
    demo = webui.create_demo("checkpoints/config.yaml", "checkpoints")
    assert demo is not None
