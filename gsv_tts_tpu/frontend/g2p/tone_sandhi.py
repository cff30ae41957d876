"""Mandarin tone sandhi rules (clean-room).

Implements the rule *structure* of the reference ``tone_sandhi.py`` (767 LoC):
neutral-tone suffixes, 不 sandhi, 一 sandhi, and third-tone sandhi, applied to
``FINALS_TONE3``-style finals.  The reference additionally carries large
lexical exception lists; here a compact high-frequency subset is used (the
rules are the load-bearing part for intelligibility).
"""
from __future__ import annotations

from typing import List, Tuple

# common neutral-tone suffixes (子/头/们/的地得/着了过/吧吗呢啊...)
NEURAL_SUFFIXES = set("子头们个么吧吗呢啊呀哇嘛的地得着了过")
# common words whose last syllable is neutral
NEURAL_TONE_WORDS = {
    "麻烦", "打算", "意思", "事情", "东西", "衣服", "知识", "力气", "耳朵",
    "喜欢", "觉得", "漂亮", "明白", "朋友", "时候", "眼睛", "先生", "告诉",
    "头发", "我们", "你们", "他们", "她们", "咱们", "这个", "那个", "什么",
    "怎么", "石头", "丈夫", "便宜", "拾掇", "拳头", "客气", "萝卜", "骆驼",
    "状元", "棉花", "胳膊", "部分", "凉快", "活泼", "玻璃", "琵琶", "glasses",
} - {"glasses"}
NOT_NEURAL_WORDS = {"男子", "女子", "分子", "原子", "量子", "莲子", "原则",
                    "虾子", "电子", "人人", "虎虎"}


class ToneSandhi:
    def pre_merge_for_modify(self, seg: List[Tuple[str, str]]) -> List[Tuple[str, str]]:
        """Merge 不/一 and reduplications with neighbours so the sandhi rules
        can see them as one unit (reference pre_merge semantics)."""
        seg = [(w, p) for w, p in seg if w.strip() or w]
        out: List[Tuple[str, str]] = []
        i = 0
        while i < len(seg):
            word, pos = seg[i]
            # 不 + X → 不X ; X + 不 (as in 好不好) handled by reduplication pass
            if word == "不" and i + 1 < len(seg):
                nxt, npos = seg[i + 1]
                out.append((word + nxt, npos))
                i += 2
                continue
            # X 一 X (听一听) → one token
            if (i + 2 < len(seg) and seg[i + 1][0] == "一"
                    and seg[i + 2][0] == word):
                out.append((word + "一" + word, pos))
                i += 3
                continue
            out.append((word, pos))
            i += 1
        # merge a trailing 儿 into the previous word
        merged: List[Tuple[str, str]] = []
        for word, pos in out:
            if word == "儿" and merged:
                merged[-1] = (merged[-1][0] + "儿", merged[-1][1])
            else:
                merged.append((word, pos))
        return merged

    # -- individual rules --------------------------------------------------

    def _neural_sandhi(self, word, pos, finals):
        if not finals:
            return finals
        # reduplication: 妈妈, 试试
        for j, ch in enumerate(word):
            if (j >= 1 and ch == word[j - 1] and pos[0] in {"n", "v", "a"}
                    and word not in NOT_NEURAL_WORDS and j < len(finals)):
                finals[j] = finals[j][:-1] + "5"
        if word in NOT_NEURAL_WORDS:
            return finals
        if (word in NEURAL_TONE_WORDS or word[-2:] in NEURAL_TONE_WORDS):
            finals[-1] = finals[-1][:-1] + "5"
        elif len(word) >= 2 and word[-1] in NEURAL_SUFFIXES and pos not in {"a", "b", "nr"}:
            if word[-1] in "的地得着了过吧吗呢啊呀哇嘛们":
                finals[-1] = finals[-1][:-1] + "5"
        return finals

    def _bu_sandhi(self, word, finals):
        # 不 between reduplication (好不好) → neutral
        if len(word) == 3 and word[1] == "不" and len(finals) == 3:
            finals[1] = finals[1][:-1] + "5"
            return finals
        for i, ch in enumerate(word):
            if ch == "不" and i < len(finals):
                # 不 + tone4 → bu2
                if i + 1 < len(finals) and finals[i + 1][-1] == "4":
                    finals[i] = finals[i][:-1] + "2"
        return finals

    def _yi_sandhi(self, word, finals):
        if "一" not in word or len(word) != len(finals):
            return finals
        # 一 between reduplication (看一看) → neutral
        if len(word) == 3 and word[1] == "一" and word[0] == word[2]:
            finals[1] = finals[1][:-1] + "5"
            return finals
        # ordinal / numeric context keeps tone 1 (第一, 一九九七, 十一)
        if any(c in word for c in "零一二三四五六七八九十百千万亿第初") and word != "一" and \
                all(c in "零一二三四五六七八九十百千万亿第初两" for c in word):
            return finals
        for i, ch in enumerate(word):
            if ch == "一" and i + 1 < len(finals):
                nxt_tone = finals[i + 1][-1]
                if nxt_tone == "4":
                    finals[i] = finals[i][:-1] + "2"  # 一 + 4th → yi2
                elif nxt_tone in "123":
                    finals[i] = finals[i][:-1] + "4"  # 一 + 1/2/3 → yi4
        return finals

    def _three_sandhi(self, word, finals):
        # consecutive third tones within a word: all but last → tone 2
        i = 0
        n = len(finals)
        while i < n:
            if finals[i][-1] == "3":
                j = i
                while j + 1 < n and finals[j + 1][-1] == "3":
                    j += 1
                for k in range(i, j):
                    finals[k] = finals[k][:-1] + "2"
                i = j + 1
            else:
                i += 1
        return finals

    def modified_tone(self, word: str, pos: str, finals: List[str]) -> List[str]:
        if len(finals) != len(word):
            return finals
        finals = self._bu_sandhi(word, finals)
        finals = self._yi_sandhi(word, finals)
        finals = self._neural_sandhi(word, pos, finals)
        finals = self._three_sandhi(word, finals)
        return finals
