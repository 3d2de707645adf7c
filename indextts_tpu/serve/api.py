"""FastAPI synthesis server (reference surface: api.py:38-319).

Endpoints:
  POST /tts           multipart (audio upload or server-side path) → WAV
  GET  /models        checkpoint discovery
  POST /model/reload  hot-swap GPT weights
  GET  /health

FastAPI/uvicorn are optional extras; importing this module without them
raises a clear error (the rest of the framework stays importable).
"""

from __future__ import annotations

import os
import tempfile
import threading
import time
from typing import Any, Dict, Optional

try:
    from fastapi import FastAPI, File, Form, HTTPException, Request, UploadFile
    from fastapi.concurrency import run_in_threadpool
    from fastapi.responses import Response
except ImportError as e:  # pragma: no cover
    raise ImportError(
        "fastapi is required for the API server: pip install 'indextts-tpu[serve]'"
    ) from e

from indextts_tpu.engine import IndexTTS


def create_app(
    cfg_path: str = "checkpoints/config.yaml",
    model_dir: str = "checkpoints",
    gpt_path: Optional[str] = None,
    speaker_info_path: Optional[str] = None,
    engine_instance: Optional[IndexTTS] = None,
    continuous: bool = False,
    tp: int = 0,
    pool_kwargs: Optional[Dict[str, Any]] = None,
    warmup_pool: bool = False,
) -> "FastAPI":
    app = FastAPI(title="IndexTTS-TPU")
    state = {"tts": engine_instance, "gpt_path": gpt_path}
    engine_lock = threading.Lock()
    pool_service = None
    if continuous and tp and tp > 1:
        raise ValueError("--continuous and --tp are mutually exclusive "
                         "(the decode pool is single-chip)")
    if continuous:
        # shared cross-request decode pool (serve/httpd.TTSService drives it)
        from indextts_tpu.serve.httpd import TTSService

        pool_service = TTSService(cfg_path, model_dir, gpt_path=gpt_path,
                                  speaker_info_path=speaker_info_path,
                                  engine_instance=engine_instance,
                                  continuous=True, pool_kwargs=pool_kwargs,
                                  warmup_pool=warmup_pool)
        if warmup_pool:
            pool_service.pool()  # build + precompile before serving

    def engine() -> IndexTTS:
        # runs on anyio threadpool workers (run_in_threadpool): without the
        # lock two early requests would each build a full engine — minutes
        # of duplicate weight loading and doubled HBM on the one chip
        with engine_lock:
            if state["tts"] is None:
                state["tts"] = IndexTTS(
                    cfg_path=cfg_path, model_dir=model_dir,
                    gpt_path=state["gpt_path"],
                    speaker_info_path=speaker_info_path, tp=tp)
            return state["tts"]

    async def _save_upload(audio_file) -> Optional[str]:
        """Uploaded prompt → temp file path (shared by /tts, /tts_stream)."""
        if audio_file is None:
            return None
        suffix = os.path.splitext(audio_file.filename or "prompt.wav")[1] or ".wav"
        tmp = tempfile.NamedTemporaryFile(suffix=suffix, delete=False)
        tmp.write(await audio_file.read())
        tmp.close()
        return tmp.name

    @app.get("/health")
    def health():
        loaded = state["tts"] is not None or (
            pool_service is not None and pool_service._tts is not None)
        return {"status": "ok", "model_loaded": loaded}

    # static browser UI (reference api.py:90-95 mounts static/index.html)
    static_dir = os.path.join(os.path.dirname(__file__), "..", "..", "static")
    if os.path.isdir(static_dir):
        from fastapi.staticfiles import StaticFiles

        app.mount("/ui", StaticFiles(directory=static_dir, html=True), name="ui")

    @app.get("/models")
    def models():
        """Checkpoint discovery — shared with the stdlib server
        (serve/httpd.discover_models) so the two surfaces can't drift."""
        from indextts_tpu.serve.httpd import discover_models

        return discover_models(model_dir, state["gpt_path"])

    @app.post("/model/reload")
    async def reload_model(request: "Request"):
        """Hot-swap GPT weights (api.py:118-175).  Accepts the reference's
        JSON body {"model_filename": ...} or our form/JSON {"gpt_path": ...}."""
        ctype = request.headers.get("content-type", "")
        if ctype.startswith("application/json"):
            body = await request.json()
        else:
            body = dict(await request.form())
        gpt_path = body.get("gpt_path") or body.get("model_filename")
        if not gpt_path:
            raise HTTPException(422, "need 'gpt_path' or 'model_filename'")
        # reference resolution order (api.py:126-133): model_dir-relative
        # first, then the path as given — so every "filename" advertised by
        # /models resolves back here
        candidates = ([gpt_path] if os.path.isabs(gpt_path)
                      else [os.path.join(model_dir, gpt_path), gpt_path])
        resolved = next((p for p in candidates if os.path.exists(p)), None)
        if resolved is None:
            raise HTTPException(404, f"checkpoint not found: {candidates[0]}")
        # absolute: IndexTTS joins relative gpt_paths with model_dir again
        resolved = os.path.abspath(resolved)
        with engine_lock:  # vs a concurrent lazy build in engine()
            state["gpt_path"] = resolved
            state["tts"] = None  # lazily rebuilt with the new weights
        if pool_service is not None:
            # continuous mode synthesizes through pool_service's own engine
            # and decode pool — resetting only the closure state would make
            # reload a silent no-op there (TTSService.reload also drops the
            # pool, whose drive thread drains and exits)
            pool_service.reload(resolved)
        return {"status": "reloaded", "gpt_path": resolved,
                "message": f"switched to {os.path.basename(resolved)}"}

    @app.post("/tts")
    async def tts(
        text: str = Form(...),
        audio_file: Optional[UploadFile] = File(None),
        audio_path: Optional[str] = Form(None),
        # reference client field names (api.py:180-182) — full aliases
        prompt_audio: Optional[UploadFile] = File(None),
        prompt_audio_path: Optional[str] = Form(None),
        infer_mode: Optional[str] = Form(None),
        mode: str = Form("fast"),
        speaker_id: Optional[str] = Form(None),
        do_sample: bool = Form(True),
        top_p: float = Form(0.8),
        top_k: int = Form(30),
        # 0.3 is the reference's API-surface default (api.py:192), below
        # the engine-level 1.0 (infer.py:632)
        temperature: float = Form(0.3),
        repetition_penalty: float = Form(10.0),
        length_penalty: float = Form(0.0),
        max_mel_tokens: int = Form(600),
        max_text_tokens_per_sentence: int = Form(120),
        sentences_bucket_max_size: int = Form(4),
        seed: Optional[int] = Form(None),
        num_beams: Optional[int] = Form(None),
        cfg_scale: Optional[float] = Form(None),
    ):
        """Synthesis (api.py:177-299).  Returns WAV bytes; the seed used is
        echoed in the X-Seed header."""
        audio_file = audio_file if audio_file is not None else prompt_audio
        audio_path = audio_path or prompt_audio_path
        mode = infer_mode or mode
        if audio_file is None and not audio_path and not speaker_id:
            raise HTTPException(400, "need audio_file, audio_path or speaker_id")
        tmp = await _save_upload(audio_file)
        prompt = tmp or audio_path
        if seed == -1:  # "pick one" (reference api.py:205-209)
            seed = None
        used_seed = seed if seed is not None else int(time.time_ns() % (2**31))
        if pool_service is not None:
            try:
                data, _ = await run_in_threadpool(pool_service.tts, {
                    "text": text, "audio_path": prompt,
                    "speaker_id": speaker_id,
                    "max_text_tokens_per_sentence": max_text_tokens_per_sentence,
                })
            except ValueError as e:
                raise HTTPException(400, str(e))
            finally:
                if tmp is not None:
                    os.unlink(tmp)
            return Response(content=data, media_type="audio/wav",
                            headers={"X-Seed": str(used_seed)})
        eng = await run_in_threadpool(engine)  # first call builds the model
        gen = dict(do_sample=do_sample, top_p=top_p, top_k=top_k,
                   temperature=temperature, repetition_penalty=repetition_penalty,
                   length_penalty=length_penalty,
                   max_mel_tokens=max_mel_tokens, seed=used_seed)
        if num_beams is not None:
            gen["num_beams"] = num_beams
        if cfg_scale is not None:
            gen["cfg_scale"] = cfg_scale
        out = tempfile.NamedTemporaryFile(suffix=".wav", delete=False)
        out.close()

        def synth():
            if mode == "fast" and not speaker_id:
                eng.infer_fast(prompt, text, out.name,
                               max_text_tokens_per_sentence=max_text_tokens_per_sentence,
                               sentences_bucket_max_size=sentences_bucket_max_size,
                               **gen)
            else:
                eng.infer(prompt, text, out.name, speaker_id=speaker_id,
                          max_text_tokens_per_sentence=max_text_tokens_per_sentence,
                          **gen)

        try:
            # blocking synthesis OFF the event loop: an `async def`
            # endpoint is not threadpooled by FastAPI, so a long decode
            # (or a multi-minute cold compile) run inline would freeze
            # every concurrent request, /health included
            await run_in_threadpool(synth)
            with open(out.name, "rb") as f:
                data = f.read()
        except ValueError as e:  # unknown speaker_id, bad params → 4xx
            raise HTTPException(400, str(e))
        finally:
            import contextlib

            with contextlib.suppress(FileNotFoundError):
                os.unlink(out.name)
            if tmp is not None:
                os.unlink(tmp)
        return Response(content=data, media_type="audio/wav",
                        headers={"X-Seed": str(used_seed)})

    @app.post("/tts_stream")
    async def tts_stream(
        text: str = Form(...),
        audio_file: Optional[UploadFile] = File(None),
        audio_path: Optional[str] = Form(None),
        prompt_audio: Optional[UploadFile] = File(None),
        prompt_audio_path: Optional[str] = Form(None),
        speaker_id: Optional[str] = Form(None),
        do_sample: bool = Form(True),
        top_p: float = Form(0.8),
        top_k: int = Form(30),
        temperature: float = Form(0.3),
        repetition_penalty: float = Form(10.0),
        length_penalty: float = Form(0.0),
        max_mel_tokens: int = Form(600),
        max_text_tokens_per_sentence: int = Form(120),
        seed: Optional[int] = Form(None),
        num_beams: Optional[int] = Form(None),
        cfg_scale: Optional[float] = Form(None),
    ):
        """Streaming synthesis: chunked WAV, one PCM chunk per sentence
        (engine.infer_stream) — first audio after one sentence's synthesis
        instead of the whole text's."""
        from fastapi.responses import StreamingResponse

        from indextts_tpu.utils.audio import wav_stream_header

        audio_file = audio_file if audio_file is not None else prompt_audio
        audio_path = audio_path or prompt_audio_path
        if audio_file is None and not audio_path and not speaker_id:
            raise HTTPException(400, "need audio_file, audio_path or speaker_id")
        tmp = await _save_upload(audio_file)
        prompt = tmp or audio_path
        if seed == -1:
            seed = None
        used_seed = seed if seed is not None else int(time.time_ns() % (2**31))
        gen = dict(do_sample=do_sample, top_p=top_p, top_k=top_k,
                   temperature=temperature,
                   repetition_penalty=repetition_penalty,
                   length_penalty=length_penalty,
                   max_mel_tokens=max_mel_tokens)
        if num_beams is not None:
            gen["num_beams"] = num_beams
        if cfg_scale is not None:
            gen["cfg_scale"] = cfg_scale
        def cleanup_tmp():
            # idempotent: runs both from the generator's finally and from
            # the response BackgroundTask (which also fires when the client
            # disconnects before the generator is first iterated, ADVICE r2)
            if tmp is not None:
                import contextlib

                with contextlib.suppress(FileNotFoundError):
                    os.unlink(tmp)

        try:
            # infer_stream validates and analyses the prompt EAGERLY, so a
            # bad speaker_id / unreadable/corrupt prompt is a clean 4xx here
            # rather than a broken 200 mid-stream; the seed is pinned at
            # call time (no race on engine state between overlapping
            # requests).  Any setup failure — including library errors from
            # an unreadable uploaded file (soundfile/librosa) — must unlink
            # the temp upload (ADVICE r2 medium).
            # the eager setup (engine build, prompt analysis, pool
            # submission) is blocking — run it off the event loop like the
            # chunks themselves (Starlette iterates the sync generator via
            # its own threadpool)
            if pool_service is not None:
                # continuous mode: sentences join the shared pool and
                # chunks stream out in order as each sentence finishes
                # (sampling params are pool-level, fixed at startup)
                def setup():
                    eng = pool_service.engine()
                    return eng.pool_infer_stream(
                        pool_service.pool(), prompt, text,
                        speaker_id=speaker_id,
                        max_text_tokens_per_sentence=max_text_tokens_per_sentence)
            else:
                def setup():
                    return engine().infer_stream(
                        prompt, text, speaker_id=speaker_id, seed=used_seed,
                        max_text_tokens_per_sentence=max_text_tokens_per_sentence,
                        **gen)
            chunks = await run_in_threadpool(setup)
        except ValueError as e:
            cleanup_tmp()
            raise HTTPException(400, str(e))
        except HTTPException:
            cleanup_tmp()
            raise
        except Exception as e:
            cleanup_tmp()
            raise HTTPException(
                400, f"could not prepare synthesis (bad prompt audio?): {e}")

        def body():
            sent_header = False
            try:
                for sr, chunk in chunks:
                    if not sent_header:
                        yield wav_stream_header(sr)
                        sent_header = True
                    yield chunk.tobytes()
                if not sent_header:
                    yield wav_stream_header(24000)
            finally:
                cleanup_tmp()

        from starlette.background import BackgroundTask

        return StreamingResponse(body(), media_type="audio/wav",
                                 headers={"X-Seed": str(used_seed)},
                                 background=BackgroundTask(cleanup_tmp))

    return app


def main(argv=None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="IndexTTS-TPU API server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=7859)
    p.add_argument("--config", default="checkpoints/config.yaml")
    p.add_argument("--model_dir", default="checkpoints")
    p.add_argument("--gpt_path", default=None)
    p.add_argument("--speaker_info", default=None)
    p.add_argument("--warmup", action="store_true",
                   help="precompile common decode shapes before serving")
    p.add_argument("--continuous", action="store_true",
                   help="cross-request continuous-batching decode pool")
    from indextts_tpu.serve.httpd import add_pool_args, pool_kwargs_from_args
    add_pool_args(p)
    p.add_argument("--tp", type=int, default=0,
                   help="tensor-parallel inference over N chips")
    args = p.parse_args(argv)

    import uvicorn

    eng = None
    if args.warmup:
        eng = IndexTTS(cfg_path=args.config, model_dir=args.model_dir,
                       gpt_path=args.gpt_path,
                       speaker_info_path=args.speaker_info, tp=args.tp)
        eng.warmup(batch_sizes=(1, 4), num_beams=1)
        eng.warmup(batch_sizes=(1, 4), num_beams=3)
    app = create_app(args.config, args.model_dir, args.gpt_path,
                     args.speaker_info, engine_instance=eng,
                     continuous=args.continuous, tp=args.tp,
                     pool_kwargs=pool_kwargs_from_args(args),
                     warmup_pool=args.warmup and args.continuous)
    uvicorn.run(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
