"""Gradio WebUI (reference surface: webui.py:24-422).

Tabs: generation (prompt upload + text + sampling/bucketing sliders), model
dropdown with hot reload, live sentence-split preview, examples from
tests/cases.jsonl.  gradio is an optional extra.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "gradio is required for the WebUI: pip install 'indextts-tpu[webui]'"
    ) from e

from indextts_tpu.engine import IndexTTS


def discover_models(model_dir: str) -> List[str]:
    out = []
    for root, _, files in os.walk(model_dir):
        for name in files:
            if name.endswith(".pth"):
                out.append(os.path.relpath(os.path.join(root, name), model_dir))
    return sorted(out)


def create_demo(cfg_path: str, model_dir: str,
                cases_path: Optional[str] = None) -> "gr.Blocks":
    state = {"tts": IndexTTS(cfg_path=cfg_path, model_dir=model_dir)}

    def reload_model(gpt_path):
        state["tts"] = IndexTTS(cfg_path=cfg_path, model_dir=model_dir,
                                gpt_path=gpt_path or None)
        return f"loaded: {gpt_path or 'default'}"

    def preview_split(text, max_tokens):
        tts = state["tts"]
        tokens = tts.tokenizer.tokenize(text)
        sents = tts.tokenizer.split_sentences(tokens, int(max_tokens))
        return [[i, len(s), "".join(s).replace("▁", " ")] for i, s in enumerate(sents)]

    def synthesize(prompt, text, mode, max_tokens, bucket_size, do_sample,
                   top_p, top_k, temperature, repetition_penalty, max_mel_tokens,
                   progress=gr.Progress()):
        tts = state["tts"]
        tts.gr_progress = progress
        gen = dict(do_sample=do_sample, top_p=top_p, top_k=int(top_k),
                   temperature=temperature, repetition_penalty=repetition_penalty,
                   max_mel_tokens=int(max_mel_tokens))
        out_path = os.path.join("outputs", "webui_gen.wav")
        if mode == "fast":
            return tts.infer_fast(prompt, text, out_path,
                                  max_text_tokens_per_sentence=int(max_tokens),
                                  sentences_bucket_max_size=int(bucket_size), **gen)
        return tts.infer(prompt, text, out_path,
                         max_text_tokens_per_sentence=int(max_tokens), **gen)

    examples = []
    if cases_path and os.path.exists(cases_path):
        with open(cases_path, "r", encoding="utf-8") as f:
            for line in f:
                try:
                    case = json.loads(line)
                    examples.append([case.get("text", "")])
                except json.JSONDecodeError:
                    pass

    with gr.Blocks(title="IndexTTS-TPU") as demo:
        gr.Markdown("# IndexTTS-TPU — zero-shot TTS")
        with gr.Tab("Generate"):
            prompt = gr.Audio(label="Reference voice", type="filepath")
            text = gr.Textbox(label="Text", lines=4)
            mode = gr.Radio(["normal", "fast"], value="fast", label="Mode")
            with gr.Accordion("Sampling", open=False):
                do_sample = gr.Checkbox(value=True, label="do_sample")
                top_p = gr.Slider(0.1, 1.0, 0.8, label="top_p")
                top_k = gr.Slider(1, 100, 30, step=1, label="top_k")
                temperature = gr.Slider(0.1, 2.0, 1.0, label="temperature")
                repetition_penalty = gr.Slider(1.0, 20.0, 10.0, label="repetition_penalty")
                max_mel_tokens = gr.Slider(50, 800, 600, step=10, label="max_mel_tokens")
                max_tokens = gr.Slider(20, 300, 100, step=2,
                                        label="max_text_tokens_per_sentence")
                bucket_size = gr.Slider(1, 16, 4, step=1,
                                         label="sentences_bucket_max_size")
            btn = gr.Button("Synthesize", variant="primary")
            audio_out = gr.Audio(label="Output")
            btn.click(synthesize,
                      [prompt, text, mode, max_tokens, bucket_size, do_sample,
                       top_p, top_k, temperature, repetition_penalty, max_mel_tokens],
                      audio_out)
            with gr.Accordion("Sentence split preview", open=False):
                preview_btn = gr.Button("Preview split")
                preview = gr.Dataframe(headers=["#", "tokens", "text"])
                preview_btn.click(preview_split, [text, max_tokens], preview)
            if examples:
                gr.Examples(examples, inputs=[text])
        with gr.Tab("Model"):
            models = gr.Dropdown(discover_models(model_dir), label="GPT checkpoint")
            reload_btn = gr.Button("Reload")
            status = gr.Textbox(label="Status")
            reload_btn.click(reload_model, [models], status)
    return demo


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="IndexTTS-TPU WebUI")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--config", default="checkpoints/config.yaml")
    p.add_argument("--model_dir", default="checkpoints")
    p.add_argument("--cases", default="tests/cases.jsonl")
    args = p.parse_args(argv)
    demo = create_demo(args.config, args.model_dir, args.cases)
    demo.launch(server_name=args.host, server_port=args.port)


if __name__ == "__main__":
    main()
