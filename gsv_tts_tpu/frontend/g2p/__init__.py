"""G2P dispatcher (reference ``G2P/__init__.py``): per-language lazy
singletons, ellipsis collapse, pause-symbol mapping, UNK filtering and
consecutive-punctuation dedup with word2ph repair (the
``len(phones) == sum(word2ph)`` invariant, reference ``G2P/__init__.py:47``)."""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .. import symbols as Symbols
from .. import pause as Pause
from ...config import global_config

symbol_to_id = Symbols.symbol_to_id
_PUNCT_SET = set(Symbols.punctuation)


def phonemes_to_ids(phones_raw: List[str]) -> List[int]:
    return [symbol_to_id[s] for s in phones_raw]


def text_to_phonemes(text: str, language: str) -> Tuple[List[str], Dict[str, list], str]:
    text = re.sub(r"\.{3,}|。{3,}", "…", text)

    if language == "zh":
        from .chinese import ChineseG2P

        if global_config.chinese_g2p is None:
            global_config.chinese_g2p = ChineseG2P(
                global_config.models_dir,
                use_jieba_fast=bool(global_config.use_jieba_fast))
        norm_text = global_config.chinese_g2p.text_normalize(text)
        phones, word2ph = global_config.chinese_g2p.g2p(norm_text)
    elif language == "ja":
        from .japanese import JapaneseG2P

        if global_config.japanese_g2p is None:
            global_config.japanese_g2p = JapaneseG2P()
        phones, word2ph = global_config.japanese_g2p.g2p(text)
        norm_text = "".join(word2ph["word"])
    else:
        from .english import EnglishG2P

        if global_config.english_g2p is None:
            global_config.english_g2p = EnglishG2P(global_config.models_dir)
        norm_text = global_config.english_g2p.text_normalize(text)
        phones, word2ph = global_config.english_g2p.g2p(norm_text)

    assert len(phones) == sum(word2ph["ph"]), (
        f"length mismatch: phones={len(phones)} vs word2ph total={sum(word2ph['ph'])}")

    # pause-symbol mapping
    for i, ph in enumerate(phones):
        if ph in Pause.pause_map:
            phones[i] = Pause.pause_map[ph]

    phones = ["UNK" if ph not in Symbols.symbol_set else ph for ph in phones]

    dup_indices = set()
    for i in range(1, len(phones)):
        if phones[i] == phones[i - 1] and phones[i] in _PUNCT_SET:
            dup_indices.add(i)

    # drop UNKs / duplicate punctuation, repairing word2ph counts
    ph_idx = len(phones)
    for w_idx in range(len(word2ph["ph"]) - 1, -1, -1):
        del_count = 0
        for _ in range(word2ph["ph"][w_idx]):
            ph_idx -= 1
            if phones[ph_idx] == "UNK" or ph_idx in dup_indices:
                del_count += 1
                phones.pop(ph_idx)
        word2ph["ph"][w_idx] -= del_count
        if word2ph["ph"][w_idx] == 0:
            word2ph["ph"].pop(w_idx)
            word2ph["word"].pop(w_idx)

    return phones, word2ph, norm_text
