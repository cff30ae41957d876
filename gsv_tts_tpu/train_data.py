"""Dataset pipeline for t2s fine-tuning: (wav, text) pairs → training samples.

The reference engine is inference-only (SURVEY §4: no training code anywhere
in the tree); the upstream GPT-SoVITS project prepares stage-1 data in three
steps — text → phones + BERT features, wav → HuBERT SSL, SSL → RVQ semantic
codes — and trains on the packed [text | audio] prompt.  This module gives
the same capability TPU-natively, reusing THIS repo's frontend, CNHubert,
and the loaded SoVITS RVQ (``models/sovits.py:extract_latent``, reference
``SoVITS/models.py:431``) so train-time featurization can never drift from
inference.

Pieces:
  * :func:`read_manifest` — ``.list`` lines (``wav|speaker|lang|text``, the
    upstream GPT-SoVITS annotation format) or ``.jsonl``
    (``{"wav": ..., "text": ..., "lang": ...}``).
  * :func:`featurize` — facade-driven extraction to ``(x_ids, y_ids, bert)``
    samples (the tuple ``parallel/train.pad_batch`` collates).
  * :func:`save_samples` / :func:`load_samples` — flat ``.npz`` shard
    (offset-indexed, no pickled objects).
  * :func:`batches` — length-bucketed padded-batch iterator with a bounded
    number of jit shapes (same PAD_MULTIPLE bucketing as inference).

End-to-end recipe: ``examples/finetune_t2s.py``.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

Sample = Tuple[np.ndarray, np.ndarray, Optional[np.ndarray]]

# manifest lang field → explicit segment tag for the language splitter
# (tag channels per ``LangSegment.py`` reference semantics); "auto"/empty
# leaves detection to LangSegment
_LANG_TAGS = {"zh": "zh", "all_zh": "zh", "ja": "ja", "all_ja": "ja",
              "en": "en", "ko": "ko", "auto": None, "": None}


def read_manifest(path) -> List[Tuple[str, str, str]]:
    """Returns ``[(wav_path, text, lang), ...]``.

    ``.list``: ``wav_path|speaker|lang|text`` (upstream GPT-SoVITS format —
    speaker is carried by the wav path and ignored here).
    ``.jsonl``: one ``{"wav": ..., "text": ..., "lang": "auto"}`` per line.
    Relative wav paths resolve against the manifest's directory.
    """
    path = Path(path)
    base = path.parent
    items: List[Tuple[str, str, str]] = []

    def resolve(p: str) -> str:
        q = Path(p)
        return str(q if q.is_absolute() else base / q)

    for lineno, line in enumerate(path.read_text(encoding="utf-8").splitlines(), 1):
        line = line.strip()
        if not line:
            continue
        if path.suffix == ".jsonl" or line.startswith("{"):
            d = json.loads(line)
            items.append((resolve(d["wav"]), d["text"], d.get("lang", "auto")))
        else:
            parts = line.split("|")
            if len(parts) < 4:
                raise ValueError(f"{path}:{lineno}: expected wav|speaker|lang|text")
            wav, _speaker, lang, text = parts[0], parts[1], parts[2], "|".join(parts[3:])
            items.append((resolve(wav), text, lang.lower()))
    return items


def featurize(tts, items: Iterable[Tuple[str, str, str]],
              sovits_model: Optional[str] = None,
              keep_bert: bool = True) -> List[Sample]:
    """Extract ``(x_ids, y_ids, bert)`` per (wav, text, lang) item with the
    facade's own stack: frontend → phone ids + BERT, CNHubert + RVQ →
    semantic codes (the exact prompt featurization of ``TTS.py:1556-1570``).

    Requires a loaded SoVITS model on ``tts`` (its RVQ codebook defines the
    semantic token space).  ``keep_bert=False`` stores ``None`` instead of
    the [n_phones, 1024] features — the train step then feeds zeros, which
    matches inference for non-Chinese text.
    """
    from .frontend.text_processor import get_phones_and_bert

    if not tts.sovits_models:
        raise ValueError("load a SoVITS model first — its RVQ codebook "
                         "defines the semantic token targets")
    if sovits_model is None:
        sovits_model = next(iter(tts.sovits_models))
    sovits = tts.sovits_models[sovits_model]
    if tts.cnhubert_model is None:
        from .models.hubert import CNHubert

        tts.cnhubert_model = CNHubert(str(tts.cnhubert_path), tts.tts_config)

    samples: List[Sample] = []
    for wav_path, text, lang in items:
        tag = _LANG_TAGS.get(lang, None)
        tagged = f"<{tag}>{text}</{tag}>" if tag else text
        phones, _word2ph, bert, _norm = get_phones_and_bert(tagged, tts.tts_config)
        codes = tts._get_prompt(tts.cnhubert_model, sovits, wav_path)
        samples.append((
            np.asarray(phones, np.int32),
            np.asarray(codes, np.int32),
            np.asarray(bert, np.float32) if keep_bert else None,
        ))
    if not tts.always_load_cnhubert:
        tts.cnhubert_model = None
    return samples


def featurize_sovits(tts, items: Iterable[Tuple[str, str, str]],
                     sovits_model: Optional[str] = None):
    """Stage-2 fine-tune featurization: (wav, text, lang) → tuples
    ``(ssl [768, T], spec [spec_ch, T], wav [T·hop], text_ids[, sv_emb])``
    for ``models/sovits_train.pad_sovits_batch``.  For v2Pro/v2ProPlus
    models each sample carries its OWN ERes2NetV2 speaker embedding
    (the sample is its own reference) so training sees the same fused
    ``ge = style + sv_emb`` conditioning inference applies
    (``models.py:315-318``) — without it the sv fusion branch is
    silently skipped and the fine-tuned model is driven at inference
    with conditioning it never saw.

    ssl (50 Hz CNHubert on the 16 kHz mono mix) and the linear spectrogram
    (model-rate STFT, 50 Hz at the v2 hop of 640 @ 32 kHz) are trimmed to a
    common frame count; the waveform is trimmed to ``T·hop`` samples so
    random slice windows always have audio under them.
    """
    import jax.numpy as jnp

    from .frontend.text_processor import get_phones_and_bert
    from .ops import stft as stft_ops

    if not tts.sovits_models:
        raise ValueError("load a SoVITS model first")
    if sovits_model is None:
        sovits_model = next(iter(tts.sovits_models))
    sovits = tts.sovits_models[sovits_model]
    hps = sovits.hps
    sr1 = int(hps.data.sampling_rate)
    hop = int(hps.data.hop_length)
    if tts.cnhubert_model is None:
        from .models.hubert import CNHubert

        tts.cnhubert_model = CNHubert(str(tts.cnhubert_path), tts.tts_config)
    sv_model = None
    if sovits.cfg.is_v2pro:
        sv_model = tts.sv_model
        if sv_model is None:
            from .models.sv import ERes2Net

            sv_model = ERes2Net(tts.sv_path, tts.tts_config)

    out = []
    for wav_path, text, lang in items:
        audio, sr0 = tts._load_audio(wav_path)
        audio = np.asarray(audio, np.float32)
        audio = audio.mean(axis=0) if audio.ndim == 2 else audio
        if sr0 != sr1:
            audio = stft_ops.resample(audio[None], sr0, sr1)[0]
        maxx = np.abs(audio).max()
        if maxx > 1:
            audio = audio / min(2.0, maxx)
        spec = np.asarray(stft_ops.spectrogram(
            jnp.asarray(audio[None], jnp.float32), int(hps.data.filter_length),
            hop, int(hps.data.win_length))[0], np.float32)
        wav16k = stft_ops.resample(audio[None], sr1, 16000)[0]
        ssl = np.asarray(tts.cnhubert_model(wav16k[None])[0], np.float32).T  # [768, T]

        T = min(spec.shape[-1], ssl.shape[-1])
        tag = _LANG_TAGS.get(lang, None)
        tagged = f"<{tag}>{text}</{tag}>" if tag else text
        phones, _w2p, _bert, _norm = get_phones_and_bert(tagged, tts.tts_config)
        sample = [ssl[:, :T], spec[:, :T],
                  audio[: T * hop].astype(np.float32),
                  np.asarray(phones, np.int32)]
        if sv_model is not None:
            sample.append(np.asarray(
                sv_model.compute_embedding3(wav16k), np.float32).reshape(-1))
        out.append(tuple(sample))
    if not tts.always_load_cnhubert:
        tts.cnhubert_model = None
    return out


def save_samples(path, samples: Sequence[Sample]) -> None:
    """Offset-indexed flat ``.npz`` (no object arrays / pickle): BERT rows
    are stored only for samples that have them (``bert_has`` marks which)."""
    x_cat = np.concatenate([s[0] for s in samples]) if samples else np.zeros(0, np.int32)
    y_cat = np.concatenate([s[1] for s in samples]) if samples else np.zeros(0, np.int32)
    x_len = np.asarray([len(s[0]) for s in samples], np.int32)
    y_len = np.asarray([len(s[1]) for s in samples], np.int32)
    bert_has = np.asarray([s[2] is not None for s in samples], bool)
    berts = [np.asarray(s[2], np.float32) for s in samples if s[2] is not None]
    bert_cat = np.concatenate(berts) if berts else np.zeros((0, 1024), np.float32)
    np.savez_compressed(path, x_cat=x_cat, y_cat=y_cat, x_len=x_len,
                        y_len=y_len, bert_has=bert_has, bert_cat=bert_cat)


def load_samples(path) -> List[Sample]:
    z = np.load(path)
    x_off = np.concatenate([[0], np.cumsum(z["x_len"])])
    y_off = np.concatenate([[0], np.cumsum(z["y_len"])])
    bert_lens = np.where(z["bert_has"], z["x_len"], 0)
    b_off = np.concatenate([[0], np.cumsum(bert_lens)])
    out: List[Sample] = []
    for i in range(len(z["x_len"])):
        x = z["x_cat"][x_off[i]: x_off[i + 1]]
        y = z["y_cat"][y_off[i]: y_off[i + 1]]
        bert = (z["bert_cat"][b_off[i]: b_off[i + 1]]
                if z["bert_has"][i] else None)
        out.append((x, y, bert))
    return out


def batches(cfg, samples: Sequence[Sample], batch_size: int,
            seed: Optional[int] = 0, drop_remainder: bool = False,
            pad_multiple: int = 32):
    """Yield padded batch dicts for ``parallel/train.make_train_step``.

    Samples are sorted by packed length so each batch pads against
    neighbours of similar size, then batch ORDER is shuffled (the
    length-bucketing idea of the inference engine applied to training:
    bounded jit shapes, minimal pad waste).  ``seed=None`` keeps sorted
    order (deterministic evaluation).
    """
    from .parallel.train import pad_batch

    order = sorted(range(len(samples)),
                   key=lambda i: len(samples[i][0]) + len(samples[i][1]))
    chunks = [order[i: i + batch_size] for i in range(0, len(order), batch_size)]
    if drop_remainder and chunks and len(chunks[-1]) < batch_size:
        chunks.pop()
    if seed is not None:
        np.random.RandomState(seed).shuffle(chunks)
    for chunk in chunks:
        group = [samples[i] for i in chunk]
        if len(group) < batch_size:  # pad short final batch by repetition
            group = group + [group[-1]] * (batch_size - len(group))
        yield pad_batch(cfg, group, pad_multiple=pad_multiple)
