"""G2P dispatcher (behavioral contract: reference ``G2P/__init__.py``):
per-language lazy singletons scoped to the models_dir they were built for,
ellipsis collapse, pause-symbol mapping, UNK filtering and
consecutive-punctuation dedup with word2ph repair (preserving the
``len(phones) == sum(word2ph)`` invariant, reference ``G2P/__init__.py:47``).

Singleton semantics: the reference keys its G2P singletons to a
``GlobalConfig`` so they always match ``models_dir`` (``Config.py:98-108``).
Here, instances this module builds are cached per ``models_dir`` and swapped
when a caller (a ``TTS`` facade with its own ``models_dir``) needs a
different one; an instance *assigned directly* to ``global_config.<lang>_g2p``
by external code (dependency injection — the test-oracle pattern) is honored
as-is and never silently replaced.
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .. import symbols as Symbols
from .. import pause as Pause
from ...config import global_config

symbol_to_id = Symbols.symbol_to_id
_PUNCT_SET = set(Symbols.punctuation)

_LANG_ATTR = {"zh": "chinese_g2p", "ja": "japanese_g2p", "en": "english_g2p"}


def phonemes_to_ids(phones_raw: List[str]) -> List[int]:
    return [symbol_to_id[s] for s in phones_raw]


def _build_g2p(lang: str, models_dir):
    if lang == "zh":
        from .chinese import ChineseG2P

        return ChineseG2P(models_dir,
                          use_jieba_fast=bool(global_config.use_jieba_fast))
    if lang == "ja":
        from .japanese import JapaneseG2P

        return JapaneseG2P()
    from .english import EnglishG2P

    return EnglishG2P(models_dir)


def _get_g2p(language: str, models_dir=None):
    """Resolve the G2P engine for ``language``: an injected instance wins;
    otherwise a per-``models_dir`` cached auto-built one."""
    lang = language if language in ("zh", "ja") else "en"
    attr = _LANG_ATTR[lang]
    current = getattr(global_config, attr)
    # Instances built elsewhere carry no _auto_models_dir marker: they were
    # deliberately installed (tests inject lexicon-backed engines) — use them.
    if current is not None and not hasattr(current, "_auto_models_dir"):
        return current
    if models_dir is None:
        models_dir = global_config.models_dir
    key = None if models_dir is None else str(models_dir)
    if current is not None and current._auto_models_dir == key:
        return current
    cache = global_config._g2p_auto.setdefault(lang, {})
    inst = cache.get(key)
    if inst is None:
        inst = _build_g2p(lang, models_dir)
        inst._auto_models_dir = key
        cache[key] = inst
    setattr(global_config, attr, inst)
    return inst


def text_to_phonemes(text: str, language: str,
                     models_dir=None) -> Tuple[List[str], Dict[str, list], str]:
    text = re.sub(r"\.{3,}|。{3,}", "…", text)

    g2p = _get_g2p(language, models_dir)
    if language == "ja":
        phones, word2ph = g2p.g2p(text)
        norm_text = "".join(word2ph["word"])
    else:
        norm_text = g2p.text_normalize(text)
        phones, word2ph = g2p.g2p(norm_text)

    assert len(phones) == sum(word2ph["ph"]), (
        f"length mismatch: phones={len(phones)} vs word2ph total={sum(word2ph['ph'])}")

    # pause-symbol mapping, then anything outside the symbol table → UNK
    phones = [Pause.pause_map.get(ph, ph) for ph in phones]
    phones = [ph if ph in Symbols.symbol_set else "UNK" for ph in phones]

    # Drop rule (computed on the pre-drop list, then applied in one pass):
    # UNK phones go; a punctuation phone equal to its immediate predecessor
    # in the original sequence goes (consecutive-punct dedup).
    keep = [ph != "UNK" for ph in phones]
    for i in range(1, len(phones)):
        if phones[i] in _PUNCT_SET and phones[i] == phones[i - 1]:
            keep[i] = False

    # Re-count each word's phone span over the keep mask; words whose span
    # empties disappear entirely (the word2ph repair invariant).
    kept_words: List[str] = []
    kept_counts: List[int] = []
    pos = 0
    for word, n_ph in zip(word2ph["word"], word2ph["ph"]):
        survivors = sum(keep[pos:pos + n_ph])
        pos += n_ph
        if survivors:
            kept_words.append(word)
            kept_counts.append(survivors)

    phones = [ph for ph, k in zip(phones, keep) if k]
    return phones, {"word": kept_words, "ph": kept_counts}, norm_text
