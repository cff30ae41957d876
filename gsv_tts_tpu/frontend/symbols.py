"""Phoneme symbol table (732 symbols) and id mapping.

The inventory is functional data shared with the reference checkpoints (the
SoVITS text embedding is indexed by it, reference ``G2P/Symbols.py:783-788``;
table regenerated into ``assets/symbols.json``).
"""
from __future__ import annotations

import json
from functools import lru_cache
from importlib import resources
from typing import Dict, List


@lru_cache(maxsize=1)
def _load():
    data = json.loads(
        resources.files("gsv_tts_tpu.assets").joinpath("symbols.json").read_text("utf-8"))
    return data


def get_symbols() -> List[str]:
    return list(_load()["symbols"])


symbols: List[str] = get_symbols()
punctuation: List[str] = list(_load()["punctuation"])
symbol_to_id: Dict[str, int] = {s: i for i, s in enumerate(symbols)}
symbol_set = frozenset(symbols)
