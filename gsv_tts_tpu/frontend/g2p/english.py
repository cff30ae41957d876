"""English G2P → ARPAbet symbols.

Dictionary chain mirroring the reference (``G2P/English/english.py``):
``cmudict.rep`` (from line 57, double-space separated) → ``cmudict-fast.rep``
→ ``engdict-hot.rep`` overrides, all loaded from ``models_dir/g2p/en`` when
present; plus the nltk cmudict corpus if installed.  OOV handling: single
letters spell out, possessive ``'s`` voicing rules, compound-word splitting
by dictionary greedy match, and a built-in rule-based letter-to-sound
fallback (the reference ships a numpy GRU seq2seq; the rule LTS keeps the
pipeline dependency-free and always emits valid ARPAbet).
"""
from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Dict, List, Optional

from ..pause import escaped_pause
from . import en_norm

_WORD_RE = re.compile(r"[A-Za-z]+(?:'[A-Za-z]+)?|[^A-Za-z\s]")

LETTER_PRON = {
    "a": ["EY1"], "b": ["B", "IY1"], "c": ["S", "IY1"], "d": ["D", "IY1"],
    "e": ["IY1"], "f": ["EH1", "F"], "g": ["JH", "IY1"], "h": ["EY1", "CH"],
    "i": ["AY1"], "j": ["JH", "EY1"], "k": ["K", "EY1"], "l": ["EH1", "L"],
    "m": ["EH1", "M"], "n": ["EH1", "N"], "o": ["OW1"], "p": ["P", "IY1"],
    "q": ["K", "Y", "UW1"], "r": ["AA1", "R"], "s": ["EH1", "S"],
    "t": ["T", "IY1"], "u": ["Y", "UW1"], "v": ["V", "IY1"],
    "w": ["D", "AH1", "B", "AH0", "L", "Y", "UW0"], "x": ["EH1", "K", "S"],
    "y": ["W", "AY1"], "z": ["Z", "IY1"],
}

# rule-based letter-to-sound fallback tables (longest-match digraphs first)
_LTS_DIGRAPH = [
    ("tion", ["SH", "AH0", "N"]), ("sion", ["ZH", "AH0", "N"]),
    ("ough", ["AO1"]), ("augh", ["AO1"]), ("igh", ["AY1"]),
    ("tch", ["CH"]), ("dge", ["JH"]), ("sch", ["S", "K"]),
    ("ch", ["CH"]), ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]),
    ("wh", ["W"]), ("ck", ["K"]), ("ng", ["NG"]), ("qu", ["K", "W"]),
    ("oo", ["UW1"]), ("ee", ["IY1"]), ("ea", ["IY1"]), ("ai", ["EY1"]),
    ("ay", ["EY1"]), ("oa", ["OW1"]), ("ow", ["OW1"]), ("ou", ["AW1"]),
    ("oi", ["OY1"]), ("oy", ["OY1"]), ("au", ["AO1"]), ("aw", ["AO1"]),
    ("ar", ["AA1", "R"]), ("er", ["ER0"]), ("ir", ["ER1"]),
    ("or", ["AO1", "R"]), ("ur", ["ER1"]),
]
_LTS_SINGLE = {
    "a": ["AE1"], "b": ["B"], "c": ["K"], "d": ["D"], "e": ["EH1"],
    "f": ["F"], "g": ["G"], "h": ["HH"], "i": ["IH1"], "j": ["JH"],
    "k": ["K"], "l": ["L"], "m": ["M"], "n": ["N"], "o": ["AA1"],
    "p": ["P"], "r": ["R"], "s": ["S"], "t": ["T"], "u": ["AH1"],
    "v": ["V"], "w": ["W"], "x": ["K", "S"], "y": ["Y"], "z": ["Z"],
}
_VOWELS = set("aeiou")


def rule_lts(word: str) -> List[str]:
    """Deterministic grapheme→ARPAbet fallback."""
    word = word.lower()
    phones: List[str] = []
    i = 0
    while i < len(word):
        matched = False
        for g, ph in _LTS_DIGRAPH:
            if word.startswith(g, i):
                phones += ph
                i += len(g)
                matched = True
                break
        if matched:
            continue
        ch = word[i]
        # silent final e
        if ch == "e" and i == len(word) - 1 and any(c in _VOWELS for c in word[:i]):
            i += 1
            continue
        if ch == "c" and i + 1 < len(word) and word[i + 1] in "eiy":
            phones.append("S")
        elif ch == "g" and i + 1 < len(word) and word[i + 1] in "eiy":
            phones.append("JH")
        elif ch == "y" and (i == len(word) - 1 or word[i + 1] not in _VOWELS) and i > 0:
            phones.append("IY0")
        elif ch in _LTS_SINGLE:
            phones += _LTS_SINGLE[ch]
        i += 1
    if not any(p[-1].isdigit() for p in phones):
        phones.append("AH0")
    return phones


def _load_cmu_rep(path: Path, skip_to_line: int = 0, sep: str = "  ") -> Dict[str, List[str]]:
    d: Dict[str, List[str]] = {}
    with open(path, encoding="utf-8", errors="ignore") as f:
        for idx, line in enumerate(f, start=1):
            if idx < skip_to_line:
                continue
            line = line.strip()
            if not line or line.startswith(";;;"):
                continue
            if sep in line:
                w, p = line.split(sep, 1)
                d.setdefault(w.lower(), p.split())
            else:
                parts = line.split(" ")
                d.setdefault(parts[0].lower(), parts[1:])
    return d


class EnglishG2P:
    def __init__(self, models_dir=None):
        self.cmu: Dict[str, List[str]] = {}
        if models_dir is not None:
            base = Path(models_dir) / "g2p" / "en"
            if (base / "cmudict.rep").exists():
                self.cmu.update(_load_cmu_rep(base / "cmudict.rep", skip_to_line=57))
            if (base / "cmudict-fast.rep").exists():
                for k, v in _load_cmu_rep(base / "cmudict-fast.rep", sep=" ").items():
                    self.cmu.setdefault(k, v)
            if (base / "engdict-hot.rep").exists():
                self.cmu.update(_load_cmu_rep(base / "engdict-hot.rep", sep=" "))
        if not self.cmu:
            try:
                from nltk.corpus import cmudict

                self.cmu = {k: v[0] for k, v in cmudict.dict().items()}
            except Exception:
                pass
        for w in ("ae", "ai", "ar", "ios", "hud", "os"):
            self.cmu.pop(w, None)

    def text_normalize(self, text: str) -> str:
        text = en_norm.normalize(text)
        text = re.sub(f"[^a-zA-Z\\s{escaped_pause}']", "", text)
        return re.sub(r"\s+", " ", text).strip()

    def qryword(self, o_word: str) -> List[str]:
        word = o_word.lower()
        if len(word) > 1 and word in self.cmu:
            return list(self.cmu[word])
        if len(word) <= 3:
            phones: List[str] = []
            for ch in word:
                if ch == "a":
                    phones += ["EY1"]
                elif not ch.isalpha():
                    phones += [ch]
                else:
                    phones += LETTER_PRON[ch]
            return phones
        m = re.match(r"^([a-z]+)'s$", word)
        if m:
            phones = self.qryword(m.group(1))[:]
            if phones and phones[-1] in ("P", "T", "K", "F", "TH", "HH"):
                phones += ["S"]
            elif phones and phones[-1] in ("S", "Z", "SH", "ZH", "CH", "JH"):
                phones += ["AH0", "Z"]
            else:
                phones += ["Z"]
            return phones
        # compound splitting by greedy dictionary match
        split = self._try_compound(word)
        if split:
            return [p for comp in split for p in self.qryword(comp)]
        return rule_lts(word)

    def _try_compound(self, word: str) -> Optional[List[str]]:
        n = len(word)
        for i in range(3, n - 2):
            a, b = word[:i], word[i:]
            if a in self.cmu and b in self.cmu:
                return [a, b]
        return None

    def g2p(self, text: str):
        tokens = _WORD_RE.findall(text)
        word2ph = {"word": [], "ph": []}
        phones: List[str] = []
        for o_word in tokens:
            word = o_word.lower()
            if re.search("[a-z]", word) is None:
                pron = [word]
            elif len(word) == 1:
                pron = ["EY1"] if o_word == "A" else list(LETTER_PRON[word])
            else:
                pron = self.qryword(o_word)
            pron = [p for p in pron if p not in (" ", "<pad>", "</s>", "<s>")]
            phones += pron
            word2ph["word"].append(o_word)
            word2ph["ph"].append(len(pron))
        return phones, word2ph
