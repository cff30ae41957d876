"""TTS engine facade — TPU-native re-implementation of the reference
``gsv_tts/TTS.py`` public API: ``infer``, ``infer_stream``, ``infer_batched``,
``infer_vc``, ``verify_speaker``, async wrappers, model registry, and the
speaker/prompt audio caches.

Pipeline (reference call stacks ``TTS.py:149-286,288-504,506-868``):
  text → frontend (cut/G2P/BERT, host) → t2s engine (jitted prefill + chunked
  decode, ``runtime/t2s_session.py``) → SoVITS decode (jitted latent pipeline
  + bucketed flow/vocoder) → host DSP (SOLA, RMS trim, Viterbi subtitles).
"""
from __future__ import annotations

import asyncio
import functools
import logging
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Dict, List, Literal, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import dsp
from .config import Config, global_config
from .frontend.pause import pause_map
from .frontend.text_processor import cut_text, get_phones_and_bert, sub2text_index
from .frontend.lang_segment import LangSegment
from .loader import (Gpt, Sovits, get_gpt_weights, get_sovits_weights,
                     gpt_to_safetensors, sovits_to_safetensors)
from .models import sovits as sovits_model
from .ops import stft
from .player import AudioClip, AudioQueue
from .utils.timing import Timings

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(filename)s - %(levelname)s: %(message)s")

DEFAULT_MUTE_SCALE = {"…": 2.0, ".": 1.5, "。": 1.5, "?": 1.5, "？": 1.5,
                      "!": 1.5, "！": 1.5, ",": 1.0, "，": 1.0, ":": 1.0,
                      "：": 1.0, ";": 1.0, "；": 1.0, "~": 1.0, "、": 0.8,
                      "・": 0.8}


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("cfg", "overlap_len", "blend"))
def _stream_core_padded_jit(params, cfg, codes_pad, codes_len, text_pad,
                            text_len, ge, noise, y_ov, vsi, overlap_len,
                            blend):
    """Jitted bucket-padded streaming vocoder core — one compiled program
    per (codes-bucket, text-bucket) shape pair; see
    ``models/sovits.py:decode_core_stream_padded``."""
    return sovits_model.decode_core_stream_padded(
        params, cfg, codes_pad, codes_len, text_pad, text_len, ge, noise,
        y_ov, vsi, overlap_len=overlap_len, blend=blend)


class _SegStream:
    """Per-segment incremental vocoder state machine shared by the
    streaming batched modes (``infer_batched_stream`` / ``stream_shared``):
    cumulative-token chunked SoVITS decode with latent cross-fade
    (``y_overlap``), SOLA waveform stitching, head trim, final mute pad,
    and (optionally) the same incremental subtitle pipeline as
    ``infer_stream`` (reference ``TTS.py:415-476``).

    ``req_state`` threads the REQUEST-level subtitle chain across a
    request's segments: ``{"last_end_s": float, "cur_text_l": int}``."""

    __slots__ = ("tokens", "vocoded", "done", "phones2", "ge", "text_cut",
                 "word2ph", "norm_text", "want_subtitles", "_y_overlap",
                 "_vsi", "_last_overlap", "_chunk_idx", "_head_offset",
                 "_last_subtitles_end")

    def __init__(self, phones2, ge, text_cut, word2ph=None, norm_text=None,
                 want_subtitles: bool = False):
        self.tokens: List[int] = []
        self.vocoded = 0
        self.done = False
        self.phones2 = phones2
        self.ge = ge
        self.text_cut = text_cut
        self.word2ph = word2ph
        self.norm_text = norm_text
        self.want_subtitles = want_subtitles
        self._y_overlap = None
        self._vsi = 0
        self._last_overlap = None
        self._chunk_idx = 0
        self._head_offset = 0
        self._last_subtitles_end = 0

    def batch_eligible(self, tts: "TTS", speed: float) -> bool:
        """True when this segment's vocode can join a cross-request batched
        program (same gate as the solo bucketed path)."""
        return (speed == 1 and self.ge.shape[-1] == 1
                and tts.stream_vocoder == "bucketed")

    def step(self, tts: "TTS", sovits, final: bool, req_state: dict, *,
             noise_scale: float, speed: float, overlap_len: int,
             cut_mute: float, cut_mute_scale_map: dict, batcher=None,
             upto: Optional[int] = None, vocode_result=None):
        """One incremental vocode pass over the cumulative tokens; returns
        ``(audio float32, new_subtitles)``.  With ``batcher`` (a
        ``runtime/vocoder_batch.VocoderBatcher``) eligible chunks are
        micro-batched across concurrent streams.  ``upto`` caps the token
        snapshot (deferred-execution callers plan several vocodes before
        running any); ``vocode_result`` injects a precomputed
        ``(audio, attn, new_overlap)`` from ``VocoderBatcher.decode_many``
        in place of the solo decode."""
        overlap_samples = overlap_len * sovits.cfg.samples_per_frame
        semantic = np.asarray(
            self.tokens if upto is None else self.tokens[:upto], np.int64)
        subtitles = []
        if semantic.size:
            if vocode_result is not None:
                audio, attn, self._y_overlap = vocode_result
            elif (batcher is not None and self.batch_eligible(tts, speed)):
                audio, attn, self._y_overlap = batcher.decode_stream(
                    sovits, semantic, np.asarray(self.phones2, np.int32),
                    self.ge, noise_scale, self._y_overlap, self._vsi,
                    overlap_len)
            else:
                audio, attn, self._y_overlap = tts._sovits_decode_stream(
                    sovits, semantic[None, None, :],
                    np.asarray(self.phones2, np.int32)[None], self.ge,
                    noise_scale=noise_scale, speed=speed,
                    y_overlap=self._y_overlap, valid_start_idx=self._vsi,
                    overlap_len=overlap_len)
            audio = np.asarray(audio).reshape(-1)
            attn = np.asarray(attn)
            if self._last_overlap is not None:
                audio, _ = dsp.sola_align(self._last_overlap, audio,
                                          overlap_samples)
            self._last_overlap = audio[-overlap_samples:].copy()
            if not final:
                audio = audio[:-overlap_samples]
                attn = attn[:, :-overlap_len, :]
                self._vsi = attn.shape[1]
            if self.want_subtitles:
                assign = dsp.viterbi_monotonic(attn)
                if dsp.is_normal_assign(assign) or final:
                    subtitles = tts._get_subtitles(
                        self.word2ph, assign, speed,
                        last_end_s=req_state["last_end_s"])
            if self._chunk_idx == 0:
                self._head_offset = dsp.find_head_threshold_offset(audio)
                audio = audio[self._head_offset:]
            if subtitles:
                tts._increment_subtitle_times(
                    subtitles, -self._head_offset / tts.samplerate)
                subtitles[0]["start_s"] = max(req_state["last_end_s"],
                                              subtitles[0]["start_s"])
            self._chunk_idx += 1
        else:
            audio = np.zeros(0, np.float32)
        if final:
            scale = tts._mute_scale(self.text_cut, cut_mute_scale_map)
            audio = np.concatenate([
                audio,
                np.zeros(int(cut_mute * scale * tts.samplerate), np.float32)])
            if subtitles:
                if not tts._check_pause(subtitles[-1]["text"]):
                    subtitles.append({"text": self.word2ph["word"][-1],
                                      "start_s": subtitles[-1]["end_s"],
                                      "end_s": subtitles[-1]["end_s"]})
                subtitles[-1]["end_s"] += cut_mute * scale
                req_state["last_end_s"] = subtitles[-1]["end_s"]
        new_subtitles = []
        if subtitles:
            subtitles = sub2text_index(subtitles, self.norm_text, self.text_cut)
            tts._increment_subtitle_indices(subtitles, req_state["cur_text_l"])
            new_subtitles = subtitles[self._last_subtitles_end:]
            self._last_subtitles_end = len(subtitles) - 1
            if not final and new_subtitles:
                new_subtitles[-1]["end_s"] = None
        if final:
            req_state["cur_text_l"] += len(self.text_cut)
        self.vocoded = max(self.vocoded,
                           len(self.tokens) if upto is None else upto)
        self.done = self.done or final
        return audio.astype(np.float32), new_subtitles


class TTS:
    """Engine facade.  Constructor mirrors the reference ``TTS.__init__``
    (``TTS.py:38-147``); CUDA-specific knobs map onto their XLA equivalents
    (``use_flash_attn`` selects the Pallas decode-attention kernel)."""

    def __init__(
        self,
        gpt_cache: List[tuple] = [(1, 512), (1, 768), (1, 1024), (4, 512), (4, 1024)],
        sovits_cache: List[int] = [50, 55],
        models_dir: Optional[str] = None,
        device: Optional[str] = None,
        dtype: Optional[str] = None,
        use_flash_attn: bool = True,
        use_bert: bool = False,
        auto_bert: bool = True,
        use_jieba_fast: bool = False,
        always_load_cnhubert: bool = False,
        always_load_sv: bool = False,
        wave_max_batch: int = 4,
        wave_max_clients: Optional[int] = None,
        stream_vocoder: str = "bucketed",
        vocoder_batch: bool = True,
        quant_t2s=False,  # False | True/"int8" (fused_step_q8) | "int4"
        t2s_softmax: str = "rows",
        quant_bert: bool = False,
        featurizer_buckets: bool = False,
    ):
        self.tts_config = Config(dtype=dtype, platform=device)
        self.tts_config.use_flash_attn = use_flash_attn
        self.tts_config.quant_t2s = quant_t2s
        self.tts_config.t2s_softmax = t2s_softmax
        self.tts_config.quant_bert = quant_bert
        self.tts_config.featurizer_buckets = featurizer_buckets
        self.tts_config.gpt_cache = gpt_cache
        self.tts_config.sovits_cache = sorted(sovits_cache) if sovits_cache else []

        self.always_load_cnhubert = always_load_cnhubert
        self.always_load_sv = always_load_sv
        self.auto_bert = auto_bert

        if models_dir is None:
            models_dir = Path.home() / ".cache" / "gsv"
        self.models_dir = Path(models_dir)
        if global_config.models_dir is None:
            global_config.models_dir = self.models_dir
        # the frontend keys its auto-built G2P engines on this, so two TTS
        # facades with different models_dir never share a lexicon
        self.tts_config.models_dir = self.models_dir
        if global_config.use_jieba_fast is None:
            global_config.use_jieba_fast = use_jieba_fast

        from .download import check_pretrained_models

        check_pretrained_models(self.models_dir)

        self.gpt_models: Dict[str, Gpt] = {}
        self.sovits_models: Dict[str, Sovits] = {}
        self.spk_audio_cache: Dict[str, dict] = {}
        self.prompt_audio_cache: Dict[str, dict] = {}
        self._decode_jit_cache: Dict[tuple, callable] = {}

        self.cnhubert_path = self.models_dir / "chinese-hubert-base"
        self.cnroberta_path = self.models_dir / "chinese-roberta-wwm-ext-large"
        self.sv_path = self.models_dir / "sv" / "pretrained_eres2netv2w24s4ep4.ckpt"
        self.default_gpt_path = self.models_dir / "s1v3.ckpt"
        self.default_sovits_path = self.models_dir / "s2Gv2ProPlus.pth"

        self._bert_loaded = False
        if use_bert:
            self._load_bert()

        self.cnhubert_model = None
        self.sv_model = None

        self.punctuation = tuple(pause_map.keys())
        self.samplerate = 32000
        self.gpt_hz = 25
        self.sovits_hz = 50

        self.audio_queue = AudioQueue(self.samplerate)
        self._infer_lock = threading.Lock()
        #: flipped by ``warmup()``; surfaced as /health "warmed"
        self._warmed = False
        # shared-wave streaming (``stream_shared``): one scheduler per GPT
        # model, created lazily; concurrent clients bypass _infer_lock, so
        # the rng chain and the featurize caches get their own locks
        self.wave_max_batch = wave_max_batch
        # admission cap on concurrent ``stream_shared`` clients per GPT
        # model (None = unbounded): past the chip's saturation knee
        # (``bench.py --saturation``) extra clients raise
        # ``WaveOverloadedError`` up front instead of degrading everyone
        self.wave_max_clients = wave_max_clients
        # "bucketed": streaming vocode chunks run as ONE jitted program per
        # (codes, text) shape bucket (lengths traced — no per-chunk
        # recompiles, no eager per-op dispatch); "exact" keeps the
        # unpadded eager path (kept for speed!=1 and as a numerical
        # cross-check)
        self.stream_vocoder = stream_vocoder
        # cross-stream vocoder micro-batching for shared-wave streaming
        # (runtime/vocoder_batch.py); created lazily on first use
        self.vocoder_batch = vocoder_batch
        self._vocoder_batcher = None
        self._wave_schedulers: Dict = {}
        self._sched_lock = threading.Lock()
        self._rng_lock = threading.Lock()
        self._prep_lock = threading.Lock()
        # first-class latency observability (SURVEY §5: the reference only has
        # tqdm bars + the WebUI RTF readout)
        self.timings = Timings()
        self._rng = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))

        logging.info(f"Platform: {self.tts_config.platform}, dtype: {jnp.dtype(self.tts_config.dtype).name}")

    # ------------------------------------------------------------------
    # model / resource management
    # ------------------------------------------------------------------

    def load_gpt_model(self, *model_paths):
        if not model_paths:
            model_paths = (self.default_gpt_path,)
        for path in model_paths:
            self.gpt_models[path] = get_gpt_weights(path, self.tts_config)
            logging.info(f"Loaded GPT model: {path}")

    def load_sovits_model(self, *model_paths):
        if not model_paths:
            model_paths = (self.default_sovits_path,)
        for path in model_paths:
            self.sovits_models[path] = get_sovits_weights(path, self.tts_config)
            logging.info(f"Loaded SoVITS model: {path}")

    def unload_gpt_model(self, *model_paths):
        for path in model_paths:
            if path in self.gpt_models:
                with self._sched_lock:
                    sched = self._wave_schedulers.pop(path, None)
                if sched is not None:
                    sched.close()
                del self.gpt_models[path]
                logging.info(f"Unloaded GPT model: {path}")
            else:
                logging.warning(f"GPT model {path} not found.")

    def unload_sovits_model(self, *model_paths):
        for path in model_paths:
            if path in self.sovits_models:
                del self.sovits_models[path]
                for audio in self.spk_audio_cache.values():
                    audio["ge"].pop(path, None)
                logging.info(f"Unloaded SoVITS model: {path}")
            else:
                logging.warning(f"SoVITS model {path} not found.")

    def get_gpt_list(self):
        return list(self.gpt_models.keys())

    def get_sovits_list(self):
        return list(self.sovits_models.keys())

    def init_language_module(self, *languages):
        from .frontend.g2p import text_to_phonemes

        for language in languages:
            if language in ("en", "zh", "ja"):
                text_to_phonemes(" .", language, models_dir=self.models_dir)
                logging.info(f"Loaded language module: {language}")
            else:
                logging.warning(f'Language "{language}" not found.')

    def to_safetensors(self, checkpoint_path: str, output_dir: Optional[str] = None):
        import os

        if output_dir is None:
            output_dir, _ = os.path.splitext(str(checkpoint_path))
        if str(checkpoint_path).endswith(".pth"):
            sovits_to_safetensors(checkpoint_path, output_dir, self.tts_config)
        else:
            gpt_to_safetensors(checkpoint_path, output_dir, self.tts_config)
        logging.info(f"Successfully converted and saved to: {output_dir}")

    # -- featurizer accessors (thread-safe: the attribute only CACHES the
    # instance under always_load_*; callers keep a local reference, so a
    # concurrent call can never see another call's tear-down publish None
    # mid-use) ------------------------------------------------------------

    def _get_sv_model(self):
        sv = self.sv_model
        if sv is None:
            from .models.sv import ERes2Net

            sv = ERes2Net(self.sv_path, self.tts_config)
            if self.always_load_sv:
                self.sv_model = sv
        return sv

    def _get_cnhubert(self):
        hub = self.cnhubert_model
        if hub is None:
            from .models.hubert import CNHubert

            hub = CNHubert(str(self.cnhubert_path), self.tts_config)
            if self.always_load_cnhubert:
                self.cnhubert_model = hub
        return hub

    # -- caches (reference ``TTS.py:1345-1480``) ------------------------

    def cache_spk_audio(self, *spk_audio_paths, sovits_model: Optional[str] = None):
        if not self.sovits_models:
            logging.error("No SoVITS models are currently loaded! Cannot cache speaker audio.")
            return
        if sovits_model is None:
            sovits_model = next(iter(self.sovits_models))
        if sovits_model not in self.sovits_models:
            logging.error(f"The SoVITS model {sovits_model} is not loaded!")
            return
        model = self.sovits_models[sovits_model]
        sv = self._get_sv_model() if model.cfg.is_v2pro else None
        for path in spk_audio_paths:
            refers, audio16k = self._get_spec(model.hps, path)
            if path not in self.spk_audio_cache:
                sv_emb = (sv.compute_embedding3(audio16k)
                          if model.cfg.is_v2pro else None)
                ge = sovits_model_ge(model, refers, sv_emb)
                self.spk_audio_cache[path] = {"ge": {sovits_model: ge}, "sv_emb": sv_emb}
            elif sovits_model not in self.spk_audio_cache[path]["ge"]:
                sv_emb = self.spk_audio_cache[path]["sv_emb"]
                if model.cfg.is_v2pro and sv_emb is None:
                    sv_emb = sv.compute_embedding3(audio16k)
                    self.spk_audio_cache[path]["sv_emb"] = sv_emb
                self.spk_audio_cache[path]["ge"][sovits_model] = sovits_model_ge(
                    model, refers, sv_emb)
            logging.info(f"Cached speaker audio: {path}")

    def cache_prompt_audio(self, prompt_audio_paths, prompt_audio_texts):
        if not self.sovits_models:
            logging.error("No SoVITS models are currently loaded! Cannot cache prompt audio.")
            return
        model = self.sovits_models[next(iter(self.sovits_models))]
        hub = self._get_cnhubert()
        if isinstance(prompt_audio_paths, (str, Path)):
            prompt_audio_paths = [prompt_audio_paths]
        if isinstance(prompt_audio_texts, str):
            prompt_audio_texts = [prompt_audio_texts] * len(prompt_audio_paths)
        for path, text in zip(prompt_audio_paths, prompt_audio_texts):
            if not text or not text.strip():
                raise ValueError(
                    "Prompt audio text is empty. Please provide the text "
                    "transcription for the reference audio.")
            prompt = self._get_prompt(hub, model, path)
            phones1, _, bert1, _ = get_phones_and_bert(text, self.tts_config)
            self.prompt_audio_cache[path] = {
                "prompt": prompt, "phones1": phones1, "bert1": bert1}
            logging.info(f"Cached prompt audio: {path}")

    def del_spk_audio(self, *spk_audio_list):
        for p in spk_audio_list:
            if p in self.spk_audio_cache:
                del self.spk_audio_cache[p]
            else:
                logging.warning(f"Speaker audio {p} not found in cache.")

    def del_prompt_audio(self, *prompt_audio_list):
        for p in prompt_audio_list:
            if p in self.prompt_audio_cache:
                del self.prompt_audio_cache[p]
            else:
                logging.warning(f"Prompt audio {p} not found in cache.")

    def get_spk_audio_list(self):
        return list(self.spk_audio_cache.keys())

    def get_prompt_audio_list(self):
        return list(self.prompt_audio_cache.keys())

    # ------------------------------------------------------------------
    # inference
    # ------------------------------------------------------------------

    def infer(self, spk_audio_path, prompt_audio_path, prompt_audio_text, text,
              return_subtitles: bool = False, top_k: int = 15, top_p: float = 1.0,
              temperature: float = 1.0, repetition_penalty: float = 1.35,
              noise_scale: float = 0.5, speed: float = 1.0,
              gpt_model=None, sovits_model=None):
        """Single-utterance synthesis (reference ``TTS.py:149-286``)."""
        if self._contains_chinese(text):
            self._ensure_bert_loaded()
        if not self._check_pause(text):
            text += "."
        gpt_model, sovits_model = self._default_models(gpt_model, sovits_model)

        sovits, ge = self._prepare_sovits_resources(sovits_model, spk_audio_path)
        gpt, prompt, phones1, bert1 = self._prepare_gpt_resources(
            gpt_model, prompt_audio_path, prompt_audio_text)

        with self.timings.span("frontend"):
            phones2, word2ph, bert2, norm_text = get_phones_and_bert(text, self.tts_config)
        all_phones = np.asarray(phones1 + phones2, np.int32)
        bert = np.concatenate([np.asarray(bert1, np.float32),
                               np.asarray(bert2, np.float32)], axis=0)

        with self.timings.span("t2s"):
            pred_semantic = gpt.engine.generate(
                all_phones, prompt, bert, top_k=top_k, top_p=top_p,
                temperature=temperature, repetition_penalty=repetition_penalty,
                rng=self._next_rng())
            semantic = np.asarray(pred_semantic).reshape(-1)

        with self.timings.span("sovits"):
            audio, attn = self._sovits_decode(
                sovits, semantic[None, None, :], np.asarray(phones2, np.int32)[None],
                ge, noise_scale=noise_scale, speed=speed)
            audio = np.asarray(audio).reshape(-1)

        if return_subtitles:
            assign = dsp.viterbi_monotonic(np.asarray(attn))
            subtitles = self._get_subtitles(word2ph, assign, speed)
            if subtitles:
                if not self._check_pause(subtitles[-1]["text"]):
                    subtitles.append({"text": word2ph["word"][-1],
                                      "start_s": subtitles[-1]["end_s"],
                                      "end_s": subtitles[-1]["end_s"]})
                subtitles[-1]["end_s"] += 0.2
                subtitles = sub2text_index(subtitles, norm_text, text)
        else:
            subtitles = []

        head_offset = dsp.find_head_threshold_offset(audio)
        audio = audio[head_offset:]
        if subtitles:
            self._increment_subtitle_times(subtitles, -head_offset / self.samplerate)
            subtitles[0]["start_s"] = max(0, subtitles[0]["start_s"])

        max_audio = np.abs(audio).max() if audio.size else 0.0
        if max_audio > 1:
            audio = audio / max_audio
        audio = np.concatenate([audio, np.zeros(int(0.2 * self.samplerate), audio.dtype)])
        audio_len_s = len(audio) / self.samplerate
        return AudioClip(self.audio_queue, audio.astype(np.float32),
                         self.samplerate, audio_len_s, subtitles, text)

    def get_timings(self):
        """Latency percentiles per pipeline stage (frontend / t2s / sovits /
        first-chunk TTFA) — the engine's observability surface; also exported
        by the HTTP server's /health endpoint."""
        return self.timings.summary()

    def warmup(self, voice: Optional[dict] = None, text: Optional[str] = None,
               stream: bool = False, gpt_model=None, sovits_model=None):
        """Precompile the serving-path programs before traffic arrives.

        A restarted server answers /health as soon as the process is up,
        but its first real request still pays the XLA compiles (prefill +
        decode bucket + vocoder: ~20-60 s cold on TPU even with the
        persistent compile cache primed, minutes without).  ``warmup()``
        runs one short synthesis through ``infer`` — and through the
        shared wave scheduler + streaming vocoder when ``stream=True`` —
        so a fleet rolling restart (POST /drain → restart → ``--warmup``)
        is hitless.  The reference has no analogue: its first request
        after ``personal_api.py`` startup pays the CUDA-graph capture
        (``t2s_model.py:210-298``).

        ``voice`` is a voices-registry bundle ({"speaker_audio",
        "prompt_audio", "prompt_text"}) to warm with production assets;
        without one, synthetic sine references are written to a temp dir
        (compiles are shape-keyed, not content-keyed, so synthetic audio
        warms the same programs).  The default ``text`` gains a Chinese
        prefix when the BERT assets are present AND this models_dir has a
        usable zh G2P backend, so the zh featurizer program compiles too.

        Scope: one short synthesis warms the buckets *its* shapes hit —
        full "first request compile-free" across all bucket sizes
        additionally relies on the primed persistent compile cache
        (``utils/timing.enable_compilation_cache``); a longer first request
        in an unprimed process still pays that bucket's compile.  Returns
        per-phase wall seconds.
        """
        import tempfile
        import time as _time

        from .utils.audio_io import save_wav

        if text is None:
            text = "warm up, testing one two three."
            if Path(self.cnroberta_path).exists():
                # Opportunistic: a zh prefix additionally compiles the zh
                # featurizer program — but only when this models_dir has a
                # working pinyin backend (pypinyin or a bundled lexicon).
                # Warmup must never fail because zh assets are absent.
                zh_prefix = "预热完成。"
                try:
                    from .frontend.g2p import text_to_phonemes

                    text_to_phonemes(zh_prefix, "zh", models_dir=self.models_dir)
                    text = zh_prefix + " " + text
                except Exception as exc:  # no zh G2P backend here
                    logging.warning(
                        "warmup: zh prefix skipped (no usable zh G2P for "
                        "models_dir=%s: %s)", self.models_dir, exc)
        stats: Dict[str, float] = {}
        t0 = _time.perf_counter()
        with tempfile.TemporaryDirectory(prefix="gsv_warmup_") as tmp:
            if voice:
                spk = voice["speaker_audio"]
                prompt = voice["prompt_audio"]
                ptext = voice.get("prompt_text") or "one two three four five."
            else:
                sr = self.samplerate
                rng = np.random.RandomState(0)

                def _sine(path, seconds, freq):
                    t = np.arange(int(sr * seconds)) / sr
                    wav = (0.3 * np.sin(2 * np.pi * freq * t)
                           + 0.01 * rng.randn(len(t))).astype(np.float32)
                    save_wav(path, wav, sr)
                    return path

                spk = _sine(f"{tmp}/warmup_spk.wav", 0.7, 220.0)
                prompt = _sine(f"{tmp}/warmup_prompt.wav", 0.6, 330.0)
                ptext = "one two three four five."
            clip = self.infer(spk, prompt, ptext, text,
                              gpt_model=gpt_model, sovits_model=sovits_model)
            if len(clip.audio_data) == 0:  # not assert: must survive python -O
                raise RuntimeError("warmup synthesis produced no audio")
            stats["infer_s"] = _time.perf_counter() - t0
            if stream:
                t1 = _time.perf_counter()
                n = 0
                for chunk in self.stream_shared(
                        spk, prompt, ptext, text, debug=False,
                        gpt_model=gpt_model, sovits_model=sovits_model):
                    n += len(chunk.audio_data)
                if n == 0:
                    raise RuntimeError("warmup stream produced no audio")
                stats["stream_s"] = _time.perf_counter() - t1
        stats["total_s"] = _time.perf_counter() - t0
        self._warmed = True
        logging.info("warmup done: %s",
                     {k: round(v, 2) for k, v in stats.items()})
        return stats

    def infer_stream(self, spk_audio_path, prompt_audio_path, prompt_audio_text,
                     text, return_subtitles: bool = False, is_cut_text: bool = True,
                     cut_minlen: int = 10, cut_mute: float = 0.4,
                     cut_mute_scale_map: dict = DEFAULT_MUTE_SCALE,
                     stream_mode: Literal["token", "sentence"] = "token",
                     stream_chunk: int = 25, overlap_len: int = 5,
                     boost_first_chunk: bool = True, top_k: int = 15,
                     top_p: float = 1.0, temperature: float = 1.0,
                     repetition_penalty: float = 1.35, noise_scale: float = 0.5,
                     speed: float = 1.0, gpt_model=None, sovits_model=None,
                     debug: bool = True):
        """Streaming synthesis generator (reference ``TTS.py:288-504``):
        token-chunked t2s decode, incremental vocoding with latent cross-fade,
        SOLA waveform stitching, incremental subtitles."""
        if self._contains_chinese(text):
            self._ensure_bert_loaded()
        if not self._check_pause(text):
            text += "."
        if stream_mode == "sentence":
            stream_chunk = 10000
        if not is_cut_text:
            cut_minlen = 10000
        cut_mute = cut_mute / speed
        gpt_model, sovits_model = self._default_models(gpt_model, sovits_model)

        sovits, ge = self._prepare_sovits_resources(sovits_model, spk_audio_path)
        gpt, prompt, phones1, bert1 = self._prepare_gpt_resources(
            gpt_model, prompt_audio_path, prompt_audio_text)

        audio_len_s = 0.0
        # request-level subtitle chain, threaded through _SegStream.step
        req_state = {"last_end_s": 0.0, "cur_text_l": 0}

        import time as _time

        _t_start = _time.perf_counter()
        _first_yield = [True]

        text_cuts = cut_text(text, cut_minlen)
        for i, text_cut in enumerate(text_cuts):
            if debug:
                logging.info(f"Processing segment {i + 1}/{len(text_cuts)}: {text_cut!r}")
            phones2, word2ph, bert2, norm_text = get_phones_and_bert(text_cut, self.tts_config)
            all_phones = np.asarray(phones1 + phones2, np.int32)
            bert = np.concatenate([np.asarray(bert1, np.float32),
                                   np.asarray(bert2, np.float32)], axis=0)

            generator = gpt.engine.generate(
                all_phones, prompt, bert, top_k=top_k, top_p=top_p,
                temperature=temperature, repetition_penalty=repetition_penalty,
                rng=self._next_rng(), stream_chunk=stream_chunk,
                boost_first_chunk=boost_first_chunk if i == 0 else False)

            # the same incremental state machine as the batched streaming
            # modes (SOLA, overlap trim, head trim, mute pad, incremental
            # subtitles) — ONE implementation, so the modes cannot diverge
            seg = _SegStream(phones2, ge, text_cut, word2ph, norm_text,
                             want_subtitles=return_subtitles)
            for pred_semantic, is_final in generator:
                seg.tokens = list(np.asarray(pred_semantic).reshape(-1))
                if not seg.tokens and not is_final:
                    continue
                audio, new_subtitles = seg.step(
                    self, sovits, is_final, req_state,
                    noise_scale=noise_scale, speed=speed,
                    overlap_len=overlap_len, cut_mute=cut_mute,
                    cut_mute_scale_map=cut_mute_scale_map)

                audio_len_s += len(audio) / self.samplerate
                if _first_yield[0]:
                    self.timings.record("ttfa_s", _time.perf_counter() - _t_start)
                    _first_yield[0] = False
                yield AudioClip(self.audio_queue, audio.astype(np.float32),
                                self.samplerate, audio_len_s, new_subtitles, text)

        if debug:
            logging.info(f"Stream inference complete. Generated {audio_len_s:.2f}s of audio.")

    def _prepare_batched_inputs(self, spk_audio_paths, prompt_audio_paths,
                                prompt_audio_texts, texts, is_cut_text,
                                cut_minlen, bert_batch_size, gpt_model,
                                sovits_model):
        """Shared front half of the batched modes: expand per-request
        inputs, cut texts into engine-request segments, featurize, and
        gather prompt/speaker resources per segment."""
        if isinstance(texts, str):
            texts = [texts]
        if any(self._contains_chinese(t) for t in texts):
            self._ensure_bert_loaded()
        texts = [t if self._check_pause(t) else t + "." for t in texts]
        if not is_cut_text:
            cut_minlen = 10000
        n = len(texts)
        if isinstance(spk_audio_paths, (str, dict, Path)):
            spk_audio_paths = [spk_audio_paths] * n
        if isinstance(prompt_audio_paths, (str, Path)):
            prompt_audio_paths = [prompt_audio_paths] * n
        if isinstance(prompt_audio_texts, str):
            prompt_audio_texts = [prompt_audio_texts] * n
        gpt_model, sovits_model = self._default_models(gpt_model, sovits_model)
        if gpt_model not in self.gpt_models:
            self.load_gpt_model(gpt_model)
        if sovits_model not in self.sovits_models:
            self.load_sovits_model(sovits_model)
        gpt = self.gpt_models[gpt_model]
        sovits = self.sovits_models[sovits_model]

        all_segments: List[str] = []
        segment_to_original: List[int] = []
        for idx, t in enumerate(texts):
            for cutted in cut_text(t, cut_minlen):
                all_segments.append(cutted)
                segment_to_original.append(idx)
        n_segs = len(all_segments)

        def expand(inp):
            return [inp[segment_to_original[i]] for i in range(n_segs)]

        spk_audio_paths = expand(spk_audio_paths)
        prompt_audio_paths = expand(prompt_audio_paths)
        prompt_audio_texts = expand(prompt_audio_texts)

        all_phones2, all_word2ph, all_bert2, all_norm_text = [], [], [], []
        for i in range(0, len(all_segments), bert_batch_size):
            p2, w2, b2, nt = get_phones_and_bert(
                all_segments[i: i + bert_batch_size], self.tts_config)
            all_phones2 += p2
            all_word2ph += w2
            all_bert2 += b2
            all_norm_text += nt

        xs, ys, berts, all_ge = [], [], [], []
        for (spk, ppath, ptext, phones2, bert2) in zip(
                spk_audio_paths, prompt_audio_paths, prompt_audio_texts,
                all_phones2, all_bert2):
            if ppath not in self.prompt_audio_cache:
                self.cache_prompt_audio(ppath, ptext)
            cache = self.prompt_audio_cache[ppath]
            _, ge = self._prepare_sovits_resources(sovits_model, spk)
            xs.append(np.asarray(cache["phones1"] + phones2, np.int32))
            ys.append(np.asarray(cache["prompt"], np.int32).reshape(-1))
            berts.append(np.concatenate([np.asarray(cache["bert1"], np.float32),
                                         np.asarray(bert2, np.float32)], axis=0))
            all_ge.append(np.asarray(ge))
        return (gpt, sovits, texts, all_segments, segment_to_original,
                all_phones2, all_word2ph, all_norm_text, xs, ys, berts, all_ge)

    def infer_batched(self, spk_audio_paths, prompt_audio_paths, prompt_audio_texts,
                      texts, return_subtitles: bool = False, is_cut_text: bool = True,
                      cut_minlen: int = 10, cut_mute: float = 0.4,
                      cut_mute_scale_map: dict = DEFAULT_MUTE_SCALE,
                      top_k: int = 15, top_p: float = 1.0, temperature: float = 1.0,
                      repetition_penalty: float = 1.35, noise_scale: float = 0.5,
                      speed: float = 1.0, bert_batch_size: int = 20,
                      sovits_batch_size: int = 10, gpt_model=None,
                      sovits_model=None):
        """Batched synthesis (reference ``TTS.py:506-868``): continuous-batched
        t2s + packed SoVITS decode with block-diagonal MRTE masks."""
        cut_mute = cut_mute / speed
        (gpt, sovits, orig_texts, all_segments, segment_to_original,
         all_phones2, all_word2ph, all_norm_text, xs, ys, berts, all_ge) = \
            self._prepare_batched_inputs(
                spk_audio_paths, prompt_audio_paths, prompt_audio_texts, texts,
                is_cut_text, cut_minlen, bert_batch_size, gpt_model,
                sovits_model)
        n_orig = len(orig_texts)
        texts = all_segments

        pred_semantic, semantic_orig_idx = gpt.engine.generate_batched(
            xs, ys, berts, top_k=top_k, top_p=top_p, temperature=temperature,
            repetition_penalty=repetition_penalty, rng=self._next_rng())

        lengths = np.asarray([len(s) for s in pred_semantic])
        idx_map = np.argsort(lengths, kind="stable")
        # dual-ended interleave to balance packed-batch lengths (``TTS.py:707-716``)
        m = len(idx_map)
        sorted_indices = np.arange(m)
        interleave = np.zeros(m, np.int64)
        interleave[0::2] = sorted_indices[: (m + 1) // 2]
        interleave[1::2] = sorted_indices[(m + 1) // 2:][::-1]
        idx_map = idx_map[interleave]
        pred_semantic = [pred_semantic[i] for i in idx_map]
        semantic_orig_idx = np.asarray(semantic_orig_idx)[idx_map]
        lengths = lengths[idx_map]

        generated_audios: List[np.ndarray] = []
        generated_subtitles: List[list] = []
        for i in range(0, len(pred_semantic), sovits_batch_size):
            end = min(i + sovits_batch_size, len(pred_semantic))
            sem_list = pred_semantic[i:end]
            cur_orig = semantic_orig_idx[i:end]
            cur_lens = lengths[i:end]

            ge_list, phones2_list, phone_lens = [], [], []
            for j, L in enumerate(cur_lens):
                oi = int(cur_orig[j])
                ge_list.append(np.broadcast_to(all_ge[oi], (1, all_ge[oi].shape[1], int(L))))
                phones2_list.append(np.asarray(all_phones2[oi], np.int32))
                phone_lens.append(len(all_phones2[oi]))
            curr_ge = np.concatenate(ge_list, axis=2)
            curr_sem = np.concatenate([np.asarray(s) for s in sem_list])[None, None, :]
            curr_phones = np.concatenate(phones2_list)[None]
            ends = np.cumsum(phone_lens)
            starts = ends - np.asarray(phone_lens)
            pairs = np.stack([starts, ends], axis=1)
            slice_indices = np.repeat(pairs, np.asarray(cur_lens) * 2, axis=0)

            curr_word2ph = {
                "word": [w for oi in cur_orig for w in all_word2ph[int(oi)]["word"]],
                "ph": [p for oi in cur_orig for p in all_word2ph[int(oi)]["ph"]],
            }

            audio_batch, attn = self._sovits_decode(
                sovits, curr_sem, curr_phones, jnp.asarray(curr_ge, self.tts_config.dtype),
                noise_scale=noise_scale, speed=speed, slice_indices=slice_indices,
                use_buckets=False)
            audio_batch = np.asarray(audio_batch).reshape(-1)

            if return_subtitles:
                assign = dsp.viterbi_monotonic(np.asarray(attn))
                subtitles = self._get_subtitles(curr_word2ph, assign, speed)
                if subtitles and not self._check_pause(subtitles[-1]["text"]):
                    subtitles.append({"text": curr_word2ph["word"][-1],
                                      "start_s": subtitles[-1]["end_s"],
                                      "end_s": subtitles[-1]["end_s"]})

            max_audio = np.abs(audio_batch).max() if audio_batch.size else 0.0
            if max_audio > 1.0:
                audio_batch = audio_batch / max_audio

            if return_subtitles:
                last_i = 0
                for j in range(len(sem_list)):
                    best_i = self._find_subtitles(subtitles, all_word2ph[int(cur_orig[j])], last_i)
                    subtitle = subtitles[last_i:best_i]
                    last_i = best_i
                    if not subtitle:
                        # misaligned attention left this segment unmatched
                        # (the reference crashes on subtitle[0] here):
                        # degrade to an empty segment instead of taking the
                        # whole batch down
                        logging.warning(
                            "subtitle alignment failed for a batched "
                            "segment; emitting it empty")
                        generated_audios.append(np.zeros(0, np.float32))
                        generated_subtitles.append([])
                        continue
                    seg_start = int(subtitle[0]["start_s"] * self.samplerate)
                    seg_end = int(subtitle[-1]["end_s"] * self.samplerate)
                    audio = audio_batch[seg_start:seg_end]
                    ho = dsp.find_head_threshold_offset(audio)
                    to = dsp.find_tail_threshold_offset(audio)
                    audio = audio[ho: len(audio) - to]
                    subtitle[0]["start_s"] += ho / self.samplerate
                    subtitle[-1]["end_s"] -= to / self.samplerate
                    subtitle = sub2text_index(subtitle, all_norm_text[int(cur_orig[j])],
                                              texts[int(cur_orig[j])])
                    generated_audios.append(audio)
                    generated_subtitles.append(subtitle)
            else:
                last_len = 0.0
                for j in range(len(sem_list)):
                    cur_len = last_len + int(cur_lens[j]) * 2 * sovits.cfg.samples_per_frame / speed
                    audio = audio_batch[int(last_len): int(cur_len)]
                    last_len = cur_len
                    ho = dsp.find_head_threshold_offset(audio)
                    to = dsp.find_tail_threshold_offset(audio)
                    generated_audios.append(audio[ho: len(audio) - to])

        ordered_audios = [None] * len(generated_audios)
        ordered_subtitles = [None] * len(generated_audios)
        for cur_pos, orig_pos in enumerate(semantic_orig_idx.tolist()):
            ordered_audios[orig_pos] = generated_audios[cur_pos]
            if return_subtitles:
                ordered_subtitles[orig_pos] = generated_subtitles[cur_pos]

        final_audios = [[] for _ in range(n_orig)]
        final_subs = [[] for _ in range(n_orig)]
        last_orig_idx = None
        cur_text_l = 0
        for i, (audio_data, subtitle) in enumerate(zip(ordered_audios, ordered_subtitles)):
            oi = segment_to_original[i]
            final_audios[oi].append(audio_data)
            scale = self._mute_scale(texts[i], cut_mute_scale_map)
            final_audios[oi].append(
                np.zeros(int(cut_mute * scale * self.samplerate), audio_data.dtype))
            if return_subtitles and subtitle:
                if oi != last_orig_idx:
                    cur_text_l = 0
                    last_orig_idx = oi
                subtitle[-1]["end_s"] += cut_mute * scale
                self._increment_subtitle_indices(subtitle, cur_text_l)
                final_subs[oi].append(subtitle)
                cur_text_l += len(texts[i])

        result = []
        for audio_list, subs_list, orig_text in zip(final_audios, final_subs, orig_texts):
            audio = np.concatenate(audio_list)
            audio_len_s = len(audio) / self.samplerate
            subs = self._cat_subtitles(*subs_list) if (return_subtitles and subs_list) else []
            result.append(AudioClip(self.audio_queue, audio.astype(np.float32),
                                    self.samplerate, audio_len_s, subs, orig_text))
        return tuple(result)

    def infer_batched_stream(self, spk_audio_paths, prompt_audio_paths,
                             prompt_audio_texts, texts,
                             return_subtitles: bool = False,
                             is_cut_text: bool = True, cut_minlen: int = 10,
                             cut_mute: float = 0.4,
                             cut_mute_scale_map: dict = DEFAULT_MUTE_SCALE,
                             stream_chunk: int = 25, overlap_len: int = 5,
                             top_k: int = 15, top_p: float = 1.0,
                             temperature: float = 1.0,
                             repetition_penalty: float = 1.35,
                             noise_scale: float = 0.5, speed: float = 1.0,
                             bert_batch_size: int = 20, gpt_model=None,
                             sovits_model=None):
        """Streaming continuous batching (beyond the reference): synthesize
        N requests CONCURRENTLY through the batched decode engine
        (``generate_batched_stream`` — one whole-step kernel wave shared by
        up to B slots) and yield ``(request_idx, AudioClip, request_done)``
        as each request's audio becomes ready, interleaved across requests.

        Per request, segments stream in text order: the current segment
        vocodes incrementally (same chunked SoVITS + latent cross-fade +
        SOLA machinery as ``infer_stream``) while later segments decoded
        early by other slots are buffered as tokens and vocoded when their
        turn comes.  Sampling uses the batched-mode semantics
        (``infer_batched``'s: no repetition penalty over generated tokens).
        With ``return_subtitles`` each clip carries the same incremental
        subtitles as ``infer_stream`` (reference ``TTS.py:444-476``),
        per-request time/index chains included."""
        cut_mute = cut_mute / speed
        (gpt, sovits, orig_texts, all_segments, segment_to_original,
         all_phones2, all_word2ph, all_norm_text, xs, ys, berts, all_ge) = \
            self._prepare_batched_inputs(
                spk_audio_paths, prompt_audio_paths, prompt_audio_texts, texts,
                is_cut_text, cut_minlen, bert_batch_size, gpt_model,
                sovits_model)
        n_segs = len(all_segments)

        orig_segments: Dict[int, List[int]] = {}
        for s, oi in enumerate(segment_to_original):
            orig_segments.setdefault(oi, []).append(s)
        cur_pos = {oi: 0 for oi in orig_segments}
        audio_len_s = {oi: 0.0 for oi in orig_segments}
        req_state = {oi: {"last_end_s": 0.0, "cur_text_l": 0}
                     for oi in orig_segments}
        seg = [_SegStream(all_phones2[s], all_ge[s], all_segments[s],
                          word2ph=all_word2ph[s], norm_text=all_norm_text[s],
                          want_subtitles=return_subtitles)
               for s in range(n_segs)]

        def clip(oi: int, audio: np.ndarray, subtitles) -> AudioClip:
            audio_len_s[oi] += len(audio) / self.samplerate
            return AudioClip(self.audio_queue, audio, self.samplerate,
                             audio_len_s[oi], subtitles, orig_texts[oi])

        # coincident chunk boundaries: requests gain tokens in lockstep, so
        # their vocodes come due on the same decode step — consume the
        # engine's GROUPED events, plan every due vocode for the step, run
        # the eligible ones as ONE batched program, then post-process and
        # yield in the ungrouped order
        batcher = self._get_vocoder_batcher() if speed == 1 else None

        for events in gpt.engine.generate_batched_stream(
                xs, ys, berts, top_k=top_k, top_p=top_p,
                temperature=temperature,
                repetition_penalty=repetition_penalty, rng=self._next_rng(),
                grouped=True):
            plan: List[dict] = []
            planned_idx: Dict[int, int] = {}

            def plan_vocode(s: int, final: bool):
                if s in planned_idx:
                    # a chunk vocode planned earlier this step is upgraded
                    # in place by the segment's final (one pass covers all
                    # tokens; a second pass would need the first's carried
                    # overlap state)
                    e = plan[planned_idx[s]]
                    e["final"] = e["final"] or final
                    e["upto"] = len(seg[s].tokens)
                else:
                    planned_idx[s] = len(plan)
                    plan.append({"s": s, "final": final,
                                 "upto": len(seg[s].tokens),
                                 "oi": segment_to_original[s]})
                seg[s].vocoded = len(seg[s].tokens)

            for s, new_toks, sdone in events:
                st = seg[s]
                st.tokens.extend(int(t) for t in new_toks)
                if sdone:
                    st.done = True
                oi = segment_to_original[s]
                if orig_segments[oi][cur_pos[oi]] != s:
                    continue  # out-of-order segment: buffer until its turn

                if not st.done:
                    if len(st.tokens) - st.vocoded >= stream_chunk:
                        plan_vocode(s, final=False)
                    continue

                # current segment finished: finalize it, then drain any
                # later segments of this request that other slots already
                # completed
                plan_vocode(s, final=True)
                cur_pos[oi] += 1
                while cur_pos[oi] < len(orig_segments[oi]):
                    nxt = orig_segments[oi][cur_pos[oi]]
                    if not seg[nxt].done:
                        break
                    plan_vocode(nxt, final=True)
                    cur_pos[oi] += 1

            if not plan:
                continue
            results = {}
            eligible = [e for e in plan if e["upto"] > 0
                        and seg[e["s"]].batch_eligible(self, speed)]
            if batcher is not None and len(eligible) >= 2:
                specs = []
                for e in eligible:
                    st = seg[e["s"]]
                    specs.append((
                        sovits, np.asarray(st.tokens[:e["upto"]], np.int64),
                        np.asarray(st.phones2, np.int32), st.ge, noise_scale,
                        st._y_overlap, st._vsi, overlap_len))
                outs = batcher.decode_many(specs)
                results = {e["s"]: r for e, r in zip(eligible, outs)}
            last_final = {e["oi"]: e["s"] for e in plan if e["final"]}
            for e in plan:
                s, final, oi = e["s"], e["final"], e["oi"]
                audio, subs = seg[s].step(
                    self, sovits, final, req_state[oi],
                    noise_scale=noise_scale, speed=speed,
                    overlap_len=overlap_len, cut_mute=cut_mute,
                    cut_mute_scale_map=cut_mute_scale_map,
                    upto=e["upto"], vocode_result=results.get(s))
                if final:
                    req_done = (cur_pos[oi] == len(orig_segments[oi])
                                and last_final[oi] == s)
                    yield oi, clip(oi, audio, subs), req_done
                elif audio.size or subs:
                    # subs must flush even when the head-trim ate the whole
                    # chunk's audio: step() already advanced the segment's
                    # subtitle cursor, so a dropped event loses them forever
                    yield oi, clip(oi, audio, subs), False

    def stream_shared(self, spk_audio_path, prompt_audio_path,
                      prompt_audio_text, text, return_subtitles: bool = False,
                      is_cut_text: bool = True, cut_minlen: int = 10,
                      cut_mute: float = 0.4,
                      cut_mute_scale_map: dict = DEFAULT_MUTE_SCALE,
                      stream_chunk: int = 25, overlap_len: int = 5,
                      top_k: int = 15, top_p: float = 1.0,
                      temperature: float = 1.0,
                      repetition_penalty: float = 1.35,
                      noise_scale: float = 0.5, speed: float = 1.0,
                      gpt_model=None, sovits_model=None, debug: bool = True,
                      cancel_event: Optional[threading.Event] = None,
                      admitted: bool = False):
        """Streaming synthesis through the SHARED wave scheduler: unlike
        ``infer_stream`` (which serializes callers behind ``_infer_lock``),
        N independent callers — threads or server requests arriving at any
        time — decode CONCURRENTLY in one batched whole-step kernel wave
        (``runtime/wave.py``), each with its own SoVITS / SOLA / subtitle
        state.  This is how one chip serves many realtime streams; the
        reference has no equivalent (its ``personal_api.py:560-663`` SSE
        clients queue on the lock).

        Sampling uses batched-mode semantics (no repetition penalty over
        generated tokens, no initial-suppression window — reference
        ``t2s_model.py:651``), so token streams match ``infer_batched`` /
        ``infer_batched_stream`` rather than solo ``infer_stream``.
        ``cancel_event`` (optional) detaches the request mid-stream — the
        async wrapper sets it when the consumer disconnects."""
        if self._contains_chinese(text):
            self._ensure_bert_loaded()
        if not self._check_pause(text):
            text += "."
        if not is_cut_text:
            cut_minlen = 10000
        cut_mute = cut_mute / speed
        gpt_model, sovits_model = self._default_models(gpt_model, sovits_model)
        with self._prep_lock:
            sovits, ge = self._prepare_sovits_resources(sovits_model, spk_audio_path)
            gpt, prompt, phones1, bert1 = self._prepare_gpt_resources(
                gpt_model, prompt_audio_path, prompt_audio_text)
        sched = self._get_wave_scheduler(gpt_model)
        # admission control: claim one client slot for this stream's WHOLE
        # multi-segment life — raises WaveOverloadedError at the
        # ``wave_max_clients`` cap (serving maps it to 503 + Retry-After),
        # so an admitted stream is never rejected mid-utterance.
        # ``admitted=True`` means the caller already holds the slot via
        # ``admit_shared_client`` (and releases it itself).
        if not admitted:
            sched.acquire_client()
        try:
            # concurrent shared streams hit chunk boundaries together (same
            # wave step) — micro-batch their vocoder chunks into one program
            batcher = self._get_vocoder_batcher() if speed == 1 else None

            import time as _time

            _t_start = _time.perf_counter()
            first_yield = True
            req_state = {"last_end_s": 0.0, "cur_text_l": 0}
            audio_len_s = 0.0
            text_cuts = cut_text(text, cut_minlen)
            for i, text_cut in enumerate(text_cuts):
                if debug:
                    logging.info(f"Shared-stream segment {i + 1}/{len(text_cuts)}: {text_cut!r}")
                with self._prep_lock:
                    phones2, word2ph, bert2, norm_text = get_phones_and_bert(
                        text_cut, self.tts_config)
                x = np.asarray(phones1 + phones2, np.int32)
                bert = np.concatenate([np.asarray(bert1, np.float32),
                                       np.asarray(bert2, np.float32)], axis=0)
                handle = sched.attach(
                    x, np.asarray(prompt, np.int32).reshape(-1), bert,
                    top_k=top_k, top_p=top_p, temperature=temperature,
                    repetition_penalty=repetition_penalty)
                seg = _SegStream(phones2, ge, text_cut, word2ph=word2ph,
                                 norm_text=norm_text,
                                 want_subtitles=return_subtitles)
                try:
                    for toks, done in handle:
                        if cancel_event is not None and cancel_event.is_set():
                            handle.cancel()
                            return
                        seg.tokens.extend(int(t) for t in toks)
                        if not done and len(seg.tokens) - seg.vocoded < stream_chunk:
                            continue
                        audio, subs = seg.step(
                            self, sovits, done, req_state,
                            noise_scale=noise_scale, speed=speed,
                            overlap_len=overlap_len, cut_mute=cut_mute,
                            cut_mute_scale_map=cut_mute_scale_map,
                            batcher=batcher)
                        if audio.size or subs or done:
                            audio_len_s += len(audio) / self.samplerate
                            if first_yield:
                                self.timings.record(
                                    "ttfa_s", _time.perf_counter() - _t_start)
                                first_yield = False
                            yield AudioClip(self.audio_queue, audio,
                                            self.samplerate, audio_len_s, subs,
                                            text)
                finally:
                    if not handle.done:
                        handle.cancel()
            if debug:
                logging.info(f"Shared-stream inference complete. Generated {audio_len_s:.2f}s of audio.")
        finally:
            if not admitted:
                sched.release_client()

    def infer_vc(self, spk_audio_path, prompt_audio_path, prompt_audio_text,
                 noise_scale: float = 0.5, speed: float = 1.0, sovits_model=None):
        """Zero-shot voice conversion (reference ``TTS.py:870-964``)."""
        if not self._check_pause(prompt_audio_text):
            prompt_audio_text += "."
        _, sovits_model = self._default_models(None, sovits_model)
        sovits, ge = self._prepare_sovits_resources(sovits_model, spk_audio_path)
        prompt = self._get_prompt(self._get_cnhubert(), sovits,
                                  prompt_audio_path)

        phones, word2ph, _, norm_text = get_phones_and_bert(prompt_audio_text, self.tts_config)
        audio, attn = self._sovits_decode(
            sovits, np.asarray(prompt, np.int64).reshape(1, 1, -1),
            np.asarray(phones, np.int32)[None], ge,
            noise_scale=noise_scale, speed=speed)
        audio = np.asarray(audio).reshape(-1)

        assign = dsp.viterbi_monotonic(np.asarray(attn))
        subtitles = self._get_subtitles(word2ph, assign, speed)
        if subtitles:
            if not self._check_pause(subtitles[-1]["text"]):
                subtitles.append({"text": word2ph["word"][-1],
                                  "start_s": subtitles[-1]["end_s"],
                                  "end_s": subtitles[-1]["end_s"]})
            subtitles[-1]["end_s"] += 0.2
            subtitles = sub2text_index(subtitles, norm_text, prompt_audio_text)

        max_audio = np.abs(audio).max() if audio.size else 0.0
        if max_audio > 1:
            audio = audio / max_audio
        audio = np.concatenate([audio, np.zeros(int(0.2 * self.samplerate), audio.dtype)])
        audio_len_s = len(audio) / self.samplerate
        return AudioClip(self.audio_queue, audio.astype(np.float32), self.samplerate,
                         audio_len_s, subtitles, prompt_audio_text)

    def verify_speaker(self, speaker1_audio: str, speaker2_audio: str):
        """Cosine similarity of SV embeddings (reference ``TTS.py:1205-1247``)."""
        if not self.sovits_models:
            logging.error("No SoVITS models are currently loaded! Cannot verify speaker.")
            return
        model = self.sovits_models[next(iter(self.sovits_models))]
        sv = self._get_sv_model()

        def emb(path):
            ent = self.spk_audio_cache.get(path)
            if ent is not None and ent["sv_emb"] is not None:
                return np.asarray(ent["sv_emb"], np.float32)
            _, audio16k = self._get_spec(model.hps, path)
            e = sv.compute_embedding3(audio16k)
            if ent is not None:  # memoize into the existing cache entry
                ent["sv_emb"] = e
            return np.asarray(e, np.float32)

        e1, e2 = emb(speaker1_audio), emb(speaker2_audio)
        return float(np.sum(e1 * e2)
                     / (np.linalg.norm(e1) * np.linalg.norm(e2) + 1e-6))

    # -- async wrappers (reference ``TTS.py:966-1162``) -----------------

    async def infer_async(self, *args, executor: Optional[ThreadPoolExecutor] = None,
                          **kwargs):
        loop = asyncio.get_running_loop()

        def run():
            with self._infer_lock:
                return self.infer(*args, **kwargs)

        return await loop.run_in_executor(executor, run)

    async def infer_stream_async(self, *args,
                                 executor: Optional[ThreadPoolExecutor] = None,
                                 **kwargs):
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()
        cancel_event = threading.Event()

        def run():
            # Exceptions must travel through the queue: the executor future
            # is discarded, so anything that escapes here would otherwise be
            # swallowed and the consumer would see a clean (empty) stream.
            try:
                with self._infer_lock:
                    gen = self.infer_stream(*args, **kwargs)
                    try:
                        for chunk in gen:
                            # abandoned consumer (client disconnect): stop
                            # synthesizing — otherwise the worker holds
                            # _infer_lock to completion while the queue
                            # grows unread
                            if cancel_event.is_set():
                                break
                            loop.call_soon_threadsafe(queue.put_nowait, chunk)
                    finally:
                        gen.close()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                loop.call_soon_threadsafe(queue.put_nowait, exc)
            finally:
                loop.call_soon_threadsafe(queue.put_nowait, None)

        loop.run_in_executor(executor, run)
        try:
            while True:
                chunk = await queue.get()
                if chunk is None:
                    break
                if isinstance(chunk, BaseException):
                    raise chunk
                yield chunk
        finally:
            cancel_event.set()

    async def stream_shared_async(self, *args,
                                  executor: Optional[ThreadPoolExecutor] = None,
                                  **kwargs):
        """Async bridge over :meth:`stream_shared`.  Deliberately does NOT
        take ``_infer_lock`` — concurrent callers sharing the wave is the
        whole point.  A consumer that stops iterating (client disconnect)
        detaches its request from the wave via ``cancel_event``."""
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()
        cancel_event = threading.Event()
        kwargs.setdefault("cancel_event", cancel_event)

        def run():
            try:
                for chunk in self.stream_shared(*args, **kwargs):
                    loop.call_soon_threadsafe(queue.put_nowait, chunk)
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                loop.call_soon_threadsafe(queue.put_nowait, exc)
            finally:
                loop.call_soon_threadsafe(queue.put_nowait, None)

        loop.run_in_executor(executor, run)
        try:
            while True:
                chunk = await queue.get()
                if chunk is None:
                    break
                if isinstance(chunk, BaseException):
                    raise chunk
                yield chunk
        finally:
            cancel_event.set()

    async def infer_batched_stream_async(self, *args,
                                         executor: Optional[ThreadPoolExecutor] = None,
                                         **kwargs):
        """Async bridge over :meth:`infer_batched_stream` (same queue-based
        relay as ``infer_stream_async`` — exceptions travel through the
        queue so consumers see them instead of a clean empty stream)."""
        loop = asyncio.get_running_loop()
        queue: asyncio.Queue = asyncio.Queue()
        cancel_event = threading.Event()

        def run():
            try:
                with self._infer_lock:
                    gen = self.infer_batched_stream(*args, **kwargs)
                    try:
                        for ev in gen:
                            if cancel_event.is_set():  # abandoned consumer
                                break
                            loop.call_soon_threadsafe(queue.put_nowait, ev)
                    finally:
                        gen.close()
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                loop.call_soon_threadsafe(queue.put_nowait, exc)
            finally:
                loop.call_soon_threadsafe(queue.put_nowait, None)

        loop.run_in_executor(executor, run)
        try:
            while True:
                ev = await queue.get()
                if ev is None:
                    break
                if isinstance(ev, BaseException):
                    raise ev
                yield ev
        finally:
            cancel_event.set()

    async def infer_batched_async(self, *args,
                                  executor: Optional[ThreadPoolExecutor] = None,
                                  **kwargs):
        loop = asyncio.get_running_loop()

        def run():
            with self._infer_lock:
                return self.infer_batched(*args, **kwargs)

        return await loop.run_in_executor(executor, run)

    async def infer_vc_async(self, *args, executor: Optional[ThreadPoolExecutor] = None,
                             **kwargs):
        loop = asyncio.get_running_loop()

        def run():
            with self._infer_lock:
                return self.infer_vc(*args, **kwargs)

        return await loop.run_in_executor(executor, run)

    # ------------------------------------------------------------------
    # internals
    # ------------------------------------------------------------------

    def _next_rng(self):
        with self._rng_lock:
            self._rng, sub = jax.random.split(self._rng)
            return sub

    def _get_wave_scheduler(self, gpt_model):
        from .runtime.wave import WaveScheduler

        with self._sched_lock:
            sched = self._wave_schedulers.get(gpt_model)
            if sched is None:
                sched = WaveScheduler(self.gpt_models[gpt_model].engine,
                                      max_batch=self.wave_max_batch,
                                      max_clients=self.wave_max_clients)
                self._wave_schedulers[gpt_model] = sched
            return sched

    def _get_vocoder_batcher(self):
        """Lazy cross-stream vocoder micro-batcher (``runtime/
        vocoder_batch.py``); ``vocoder_batch=False`` disables it (each
        shared stream then vocodes solo)."""
        if not self.vocoder_batch:
            return None
        from .runtime.vocoder_batch import VocoderBatcher

        with self._sched_lock:
            if self._vocoder_batcher is None:
                self._vocoder_batcher = VocoderBatcher(
                    self, max_batch=self.wave_max_batch)
            return self._vocoder_batcher

    def shared_stream_overloaded(self, gpt_model=None) -> bool:
        """Advisory pre-check: True when a new ``stream_shared`` client
        would be rejected (``wave_max_clients`` reached for the model's
        scheduler).  Serving uses the AUTHORITATIVE
        :meth:`admit_shared_client` instead — this stays for dashboards
        and cheap load probes."""
        if self.wave_max_clients is None:
            return False
        gpt_model, _ = self._default_models(gpt_model, None)
        if gpt_model not in self.gpt_models:
            return False  # not loaded yet ⇒ no clients on it
        return self._get_wave_scheduler(gpt_model).overloaded

    def admit_shared_client(self, gpt_model=None):
        """Authoritatively claim a shared-stream client slot BEFORE the
        stream starts (lets serving answer 503 before the SSE response
        begins, with no check-then-acquire race).  Raises
        ``WaveOverloadedError`` at the ``wave_max_clients`` cap; returns
        a zero-arg release callable the caller MUST invoke when the
        stream ends, passing ``admitted=True`` to :meth:`stream_shared`
        so it does not double-claim.  Returns None when the model has no
        scheduler yet (not loaded ⇒ zero clients; the stream's own
        acquire cannot lose a race that matters)."""
        gpt_model, _ = self._default_models(gpt_model, None)
        if gpt_model not in self.gpt_models:
            return None
        sched = self._get_wave_scheduler(gpt_model)
        sched.acquire_client()
        return sched.release_client

    def wave_stats(self) -> Dict:
        """Shared-wave scheduler state per GPT model (serving /health).
        Every value is a per-model ``{"waves": [...]}`` dict — batcher
        counters live in :meth:`vocoder_batch_stats` so consumers can
        iterate these values uniformly."""
        with self._sched_lock:
            return {str(k): s.stats for k, s in self._wave_schedulers.items()}

    def vocoder_batch_stats(self) -> Dict:
        """Cross-stream vocoder micro-batcher counters (empty dict until
        the first shared stream engages it)."""
        with self._sched_lock:
            if self._vocoder_batcher is None:
                return {}
            return dict(self._vocoder_batcher.stats)

    def _default_models(self, gpt_model, sovits_model):
        if gpt_model is None:
            gpt_model = (next(iter(self.gpt_models)) if self.gpt_models
                         else self.default_gpt_path)
        if sovits_model is None:
            sovits_model = (next(iter(self.sovits_models)) if self.sovits_models
                            else self.default_sovits_path)
        return gpt_model, sovits_model

    def _prepare_gpt_resources(self, gpt_model, prompt_audio_path, prompt_audio_text):
        if gpt_model not in self.gpt_models:
            self.load_gpt_model(gpt_model)
        if prompt_audio_path not in self.prompt_audio_cache:
            self.cache_prompt_audio(prompt_audio_path, prompt_audio_text)
        cache = self.prompt_audio_cache[prompt_audio_path]
        return (self.gpt_models[gpt_model], cache["prompt"], cache["phones1"],
                cache["bert1"])

    def _prepare_sovits_resources(self, sovits_model, spk_audio_path):
        if sovits_model not in self.sovits_models:
            self.load_sovits_model(sovits_model)
        if isinstance(spk_audio_path, dict):
            weight_sum = sum(spk_audio_path.values())
            ge = None
            for path, weight in spk_audio_path.items():
                if (path not in self.spk_audio_cache
                        or sovits_model not in self.spk_audio_cache[path]["ge"]):
                    self.cache_spk_audio(path, sovits_model=sovits_model)
                part = self.spk_audio_cache[path]["ge"][sovits_model] * (weight / weight_sum)
                ge = part if ge is None else ge + part
        else:
            if (spk_audio_path not in self.spk_audio_cache
                    or sovits_model not in self.spk_audio_cache[spk_audio_path]["ge"]):
                self.cache_spk_audio(spk_audio_path, sovits_model=sovits_model)
            ge = self.spk_audio_cache[spk_audio_path]["ge"][sovits_model]
        return self.sovits_models[sovits_model], ge

    # -- SoVITS decode entry points ------------------------------------

    def _sovits_decode(self, sovits: Sovits, codes, text, ge, noise_scale=0.5,
                       speed=1.0, slice_indices=None, use_buckets=True):
        """Full (non-streaming) decode.  Mirrors ``SynthesizerTrn.decode``
        with the bucketed flow+vocoder region (``models.py:406-425``)."""
        cfg = sovits.cfg
        p = sovits.params
        dtype = self.tts_config.dtype
        codes = np.asarray(codes, np.int32)
        text = np.asarray(text, np.int32)
        ge = jnp.asarray(ge, dtype)
        n = codes.shape[-1]
        t50 = n * 2
        if (speed == 1 and slice_indices is None and ge.shape[-1] == 1
                and self.stream_vocoder == "bucketed"):
            # same bucket-padded jitted program as the streaming path
            # (vsi=0, no blend) — one compile per shape bucket instead of
            # eager dispatch + one compile per exact length
            CB = sovits_model.STREAM_PAD_MULTIPLE
            Bc = _round_up(max(n, 1), CB)
            Np = _round_up(max(text.shape[-1], 1), CB)
            codes_pad = np.zeros((1, 1, Bc), np.int32)
            codes_pad[..., :n] = codes.reshape(1, 1, -1)
            text_pad = np.zeros((1, Np), np.int32)
            text_pad[..., :text.shape[-1]] = text.reshape(1, -1)
            noise = (jax.random.normal(self._next_rng(),
                                       (1, cfg.inter_channels, 2 * Bc),
                                       jnp.float32) * noise_scale).astype(dtype)
            y_ov = jnp.zeros((1, cfg.hidden_channels, 1), dtype)
            z_p, mask, attn, _ = _stream_core_padded_jit(
                p, cfg, jnp.asarray(codes_pad), jnp.int32(n),
                jnp.asarray(text_pad), jnp.int32(text.shape[-1]), ge, noise,
                y_ov, jnp.int32(0), 1, False)
            # pass the FULL [1, C, 2*Bc] padded core outputs through: the
            # mask is length-aware (flow/WN layers re-mask every step, the
            # bucket suites assert pad-neutrality), and an eager
            # z_p[:, :, :t50] device slice would compile per t50 — the
            # linear compile tail the r5 soak measured (+8 programs/min
            # under varying chain lengths).  Bucket-to-bucket pad/slice
            # inside _flow_dec_bucketed stays a bounded shape set.
            audio = self._flow_dec_bucketed(
                sovits, z_p, mask, ge, use_buckets, t_true=t50)
            # slice attn in NUMPY: t50 varies per request, and an eager
            # device-array slice compiles a fresh dynamic_slice/squeeze
            # executable per shape — unbounded jit-cache (and, on CPU,
            # LLVM mmap-section) growth under sustained serving; the r5
            # soak killed a server this way at vm.max_map_count
            return audio, np.asarray(attn)[0][..., :t50, :text.shape[-1]]
        t_lat = int(t50 / speed) + 1 if speed != 1 else t50
        noise = (jax.random.normal(self._next_rng(), (1, cfg.inter_channels, t_lat),
                                   jnp.float32) * noise_scale).astype(dtype)
        si = None if slice_indices is None else jnp.asarray(np.asarray(slice_indices, np.int32))
        # ONE jitted program per exact shape, not an eager op-by-op run:
        # the packed infer_batched path measured ~160 eager op dispatches
        # (= 160 compiled micro-executables AND 160 tunnel RTTs on TPU)
        # per call.  Shapes stay exact (reference packed semantics — a
        # retrace per new packed length is the documented cost of this
        # path); speed is static, arrays are traced.
        key = (cfg, "decode_core", float(speed), si is not None)
        core = self._decode_jit_cache.get(key)
        if core is None:
            spd = float(speed)

            def core(p_, codes_, text_, ge_, noise_, si_,
                     _cfg=cfg, _spd=spd):
                return sovits_model.decode_core(
                    p_, _cfg, codes_, text_, ge_, noise_, speed=_spd,
                    slice_indices=si_)

            core = jax.jit(core)
            self._decode_jit_cache[key] = core
        z_p, y_mask, attn, _, ge_out = core(
            p, jnp.asarray(codes), jnp.asarray(text), ge, noise, si)
        audio = self._flow_dec_bucketed(sovits, z_p, y_mask, ge_out, use_buckets)
        return audio, np.asarray(attn)[0]  # numpy: see bucketed branch

    def _sovits_decode_stream(self, sovits: Sovits, codes, text, ge, noise_scale,
                              speed, y_overlap, valid_start_idx, overlap_len):
        cfg = sovits.cfg
        dtype = self.tts_config.dtype
        codes = np.asarray(codes, np.int32)
        text = np.asarray(text, np.int32)
        ge = jnp.asarray(ge, dtype)
        n = codes.shape[-1]
        t_valid = n * 2 - valid_start_idx
        if speed == 1 and ge.shape[-1] == 1 and self.stream_vocoder == "bucketed":
            # bucket-padded ONE-program path: pads codes/text to
            # 32-multiples so every chunk of every request reuses a
            # handful of compiled programs; lengths and the chunk offset
            # are traced scalars.  The eager exact-shape path pays per-op
            # dispatch (tunnel RTT under axon) and a new shape per chunk.
            # The WHOLE chunk (core + bucket pad + flow + HiFi-GAN) runs
            # as the B=1 case of the fused cross-stream program — the
            # split core→pad→flow sequence measured dispatch-bound over
            # the tunnel (~18 ms vs 8.2 fused; see
            # runtime/vocoder_batch.py).
            from .runtime.vocoder_batch import _stream_batch_fused_jit

            CB = sovits_model.STREAM_PAD_MULTIPLE
            Bc = _round_up(max(n, 1), CB)
            Np = _round_up(max(text.shape[-1], 1), CB)
            codes_pad = np.zeros((1, 1, Bc), np.int32)
            codes_pad[..., :n] = codes.reshape(1, 1, -1)
            text_pad = np.zeros((1, Np), np.int32)
            text_pad[..., :text.shape[-1]] = text.reshape(1, -1)
            OUT = 2 * Bc
            noise = (jax.random.normal(self._next_rng(),
                                       (1, cfg.inter_channels, OUT),
                                       jnp.float32) * noise_scale).astype(dtype)
            blend = y_overlap is not None
            y_ov = y_overlap if blend else jnp.zeros(
                (1, cfg.hidden_channels, overlap_len), dtype)
            bucket = self._flow_bucket(t_valid)
            audio, attn, new_overlap = _stream_batch_fused_jit(
                sovits.params, cfg, jnp.asarray(codes_pad),
                jnp.asarray([n], np.int32), jnp.asarray(text_pad),
                jnp.asarray([text.shape[-1]], np.int32), ge, noise,
                jnp.asarray(y_ov, dtype),
                jnp.asarray([valid_start_idx], np.int32),
                jnp.asarray([blend]), overlap_len, bucket)
            # numpy slicing (t_valid / n vary per chunk): an eager device
            # slice would compile per shape — see _sovits_decode
            audio = np.asarray(audio)[:, :, : t_valid * cfg.samples_per_frame]
            attn = np.asarray(attn)[..., :2 * n, :text.shape[-1]]
            return audio, attn[0], new_overlap
        t_lat = int(t_valid / speed) + 1 if speed != 1 else t_valid
        noise = (jax.random.normal(self._next_rng(), (1, cfg.inter_channels, t_lat),
                                   jnp.float32) * noise_scale).astype(dtype)
        z_p, y_mask, attn, new_overlap, ge_out = sovits_model.decode_core(
            sovits.params, cfg, jnp.asarray(codes), jnp.asarray(text), ge,
            noise, speed=speed, y_overlap=y_overlap,
            valid_start_idx=valid_start_idx, overlap_len=overlap_len)
        audio = self._flow_dec_bucketed(sovits, z_p, y_mask, ge_out, True)
        return audio, np.asarray(attn)[0], new_overlap

    def _flow_bucket(self, t: int, use_buckets: bool = True) -> int:
        """Frame bucket for a t-frame flow/vocoder run: first configured
        ``sovits_cache`` bucket that fits, else the ×1.5 geometric ladder
        above them (O(log t) compiled programs for arbitrary lengths), else
        exact shape (``sovits_cache=[]`` ⇒ reference CPU semantics)."""
        buckets = self.tts_config.sovits_cache or []
        if use_buckets:
            for b in buckets:
                if b >= t:
                    return b
        if not buckets:
            return t
        target = max(buckets)
        while target < t:
            target = _round_up(int(target * 1.5) + 1, 64)
        return target

    def _flow_dec_bucketed(self, sovits: Sovits, z_p, y_mask, ge,
                           use_buckets: bool, t_true: int = None):
        """Pad z_p to a fixed frame bucket and run the jitted flow+vocoder
        (the reference's CUDA-graph region, ``models.py:406-425``).

        ``t_true``: valid frame count when ``z_p`` arrives bucket-padded
        beyond it (the padded-core path) — the bucket is sized from it and
        the returned audio trimmed to it.  The trim runs in NUMPY: a
        device-array slice at a per-request length compiles a fresh
        executable per shape (r5 soak finding); every caller consumes host
        audio anyway."""
        cfg = sovits.cfg
        t = t_true if t_true is not None else z_p.shape[-1]
        target = self._flow_bucket(t, use_buckets)
        pad = target - z_p.shape[-1]
        if pad > 0:
            z_p = jnp.pad(z_p, [(0, 0), (0, 0), (0, pad)])
            y_mask = jnp.pad(y_mask, [(0, 0), (0, 0), (0, pad)])
            if ge.shape[-1] != 1:  # packed mode: frame-wise conditioning
                ge = jnp.pad(ge, [(0, 0), (0, 0), (0, pad)])
        elif pad < 0:
            # bucket-padded input larger than the target bucket: slice —
            # both sizes come from bounded bucket sets, and target >= t
            # keeps every valid frame
            z_p = z_p[:, :, :target]
            y_mask = y_mask[:, :, :target]
            if ge.shape[-1] != 1:
                ge = ge[:, :, :target]
        # keyed by the (hashable, frozen) cfg — the only value the closure
        # captures; params are a traced argument, so same-cfg models share
        # the executable and an id()-reuse after unload can never serve a
        # stale closure
        key = (cfg, "flow_dec")
        fn = self._decode_jit_cache.get(key)
        if fn is None:
            fn = jax.jit(lambda p, z, m, g: sovits_model.flow_dec(p, cfg, z, m, g))
            self._decode_jit_cache[key] = fn
        audio = fn(sovits.params, z_p, y_mask, ge)
        return np.asarray(audio)[:, :, : t * cfg.samples_per_frame]

    # -- audio preprocessing -------------------------------------------

    def _load_audio(self, path):
        from .utils.audio_io import load_audio

        return load_audio(path)

    def _get_spec(self, hps, filename):
        """Linear spectrogram + 16 kHz mono audio (reference ``TTS.py:1578-1610``)."""
        sr1 = int(hps.data.sampling_rate)
        audio, sr0 = self._load_audio(filename)
        audio = np.asarray(audio, np.float32)
        if audio.ndim == 2 and audio.shape[0] > 1:
            audio = audio.mean(axis=0, keepdims=True)
        elif audio.ndim == 1:
            audio = audio[None]
        if sr0 != sr1:
            audio = stft.resample(audio, sr0, sr1)
        maxx = np.abs(audio).max()
        if maxx > 1:
            audio = audio / min(2.0, maxx)
        spec = stft.spectrogram(jnp.asarray(audio), hps.data.filter_length,
                                hps.data.hop_length, hps.data.win_length)
        spec = spec.astype(self.tts_config.dtype)
        audio16k = stft.resample(audio, sr1, 16000)
        return spec, audio16k

    def _get_prompt(self, cnhubert_model, sovits: Sovits, audio_path):
        """Prompt semantic tokens (reference ``TTS.py:1556-1570``)."""
        wav, sr = self._load_audio(audio_path)
        wav16k = stft.resample(np.asarray(wav, np.float32), sr, 16000).mean(axis=0)
        wav16k = np.concatenate([wav16k, np.zeros(int(16000 * 0.3), np.float32)])
        ssl = cnhubert_model(wav16k[None])  # [1, frames, 768]
        ssl = jnp.transpose(ssl, (0, 2, 1))
        if self.tts_config.featurizer_buckets:
            # RVQ is per-frame and ssl_proj is a no-pad strided conv, so
            # zero-padding the frame axis and trimming the codes is exact;
            # this keeps extract_latent's op shapes on a bounded ladder
            # alongside the bucketed hubert program
            F = int(ssl.shape[-1])
            k = int(np.asarray(sovits.params["ssl_proj.weight"]).shape[-1])
            n_codes = (F - k) // 2 + 1
            pad_F = -(-F // 64) * 64
            if pad_F != F:
                ssl = jnp.pad(ssl, ((0, 0), (0, 0), (0, pad_F - F)))
            codes = sovits_model.extract_latent(sovits.params, ssl)[..., :n_codes]
        else:
            codes = sovits_model.extract_latent(sovits.params, ssl)
        return np.asarray(codes[0, 0])

    # -- misc helpers ---------------------------------------------------

    def _contains_chinese(self, text: str) -> bool:
        return any(seg["lang"] == "zh" for seg in LangSegment.getTexts(text))

    def _ensure_bert_loaded(self):
        if self._bert_loaded or not self.auto_bert:
            return
        self._load_bert()

    def _load_bert(self):
        from .models.roberta import CNRoberta

        try:
            self.tts_config.cnroberta = CNRoberta(str(self.cnroberta_path), self.tts_config)
            self._bert_loaded = True
            logging.info("BERT model loaded for Chinese text")
        except FileNotFoundError:
            # reference auto-downloads the BERT zip when the dir is
            # missing (``TTS.py:125-129``) — try the same before
            # degrading to zero features
            from .download import download_bert

            if download_bert(self.models_dir):
                try:
                    self.tts_config.cnroberta = CNRoberta(
                        str(self.cnroberta_path), self.tts_config)
                    self._bert_loaded = True
                    logging.info("BERT model downloaded and loaded")
                    return
                except FileNotFoundError:
                    pass
            logging.warning("BERT model files not found; Chinese synthesis will "
                            "use zero BERT features")
            self._bert_loaded = True  # don't retry every call

    def _check_pause(self, text: str) -> bool:
        return text.endswith(self.punctuation) or text[-3:] in ("...", "。。。")

    def _mute_scale(self, text_cut: str, scale_map: dict) -> float:
        if text_cut and text_cut[-1] in scale_map:
            return scale_map[text_cut[-1]]
        if "…" in scale_map and text_cut[-3:] in ("...", "。。。"):
            return scale_map["…"]
        return 1.0

    def _get_subtitles(self, word2ph, assign, speed, last_end_s=0.0):
        """Word timing from the frame→phone assignment (reference
        ``_get_subtitles``, ``TTS.py:1664-1707``)."""
        frame_time = (1 / self.sovits_hz) / speed
        assign = np.asarray(assign)
        ph_end_s = []
        cur_ph = int(assign[0])
        for f in range(1, assign.shape[-1]):
            ph = int(assign[f])
            if ph != cur_ph:
                ph_end_s.append(f * frame_time)
                cur_ph = ph
        ph_end_s.append(assign.shape[-1] * frame_time)

        idx = -1
        if assign[0] == -1:
            end_s = last_end_s + ph_end_s.pop(0)
        else:
            end_s = last_end_s
        subtitles = []
        word = ""
        for i in range(len(word2ph["word"])):
            word, ph = word2ph["word"][i], word2ph["ph"][i]
            idx += ph
            if idx >= len(ph_end_s):
                break
            start_s = end_s
            end_s = ph_end_s[idx] + last_end_s
            subtitles.append({"text": word, "start_s": start_s, "end_s": end_s})
        # fallback entry covering the tail (``TTS.py:1697-1705``) — applies
        # even when the loop broke before appending anything.  The extra
        # ``ph_end_s`` guard degrades a fully-degenerate assignment (every
        # frame on the nullkey: the pop above emptied the list) to empty
        # subtitles where the reference would crash on ph_end_s[-1]
        if word and ph_end_s and end_s - last_end_s != ph_end_s[-1]:
            subtitles.append({"text": word, "start_s": end_s,
                              "end_s": ph_end_s[-1] + last_end_s})
        return subtitles

    def _find_subtitles(self, subtitles, word2ph, last_i):
        target = " ".join(word2ph["word"])
        w = len(word2ph["word"])
        for i in range(last_i, len(subtitles) - w + 1):
            if " ".join(s["text"] for s in subtitles[i:i + w]) == target:
                break
        else:
            i = len(subtitles) - w
        return i + w

    def _cat_subtitles(self, *subtitles_list):
        last_end_s = 0.0
        result = []
        for subtitles in subtitles_list:
            if not subtitles:
                continue
            m = subtitles[0]["start_s"] - last_end_s
            for s in subtitles:
                s["start_s"] -= m
                s["end_s"] -= m
                result.append(s)
            last_end_s = subtitles[-1]["end_s"]
        return result

    def _increment_subtitle_indices(self, subtitles, increment):
        for s in subtitles:
            s["orig_idx_start"] += increment
            s["orig_idx_end"] += increment

    def _increment_subtitle_times(self, subtitles, increment):
        for s in subtitles:
            s["start_s"] += increment
            if s["end_s"]:
                s["end_s"] += increment


def sovits_model_ge(model: Sovits, refers, sv_emb=None):
    """Compute the speaker conditioning vector for a loaded SoVITS model."""
    sv = None if sv_emb is None else jnp.asarray(sv_emb)
    return sovits_model.get_ge(model.params, model.cfg, jnp.asarray(refers), sv)
