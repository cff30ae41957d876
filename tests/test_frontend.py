"""Frontend tests: symbols, language segmentation, cut_text, G2P invariants,
normalizers, and subtitle-index parity vs the reference algorithms."""
import re
import sys
import types

import numpy as np
import pytest

from gsv_tts_tpu.frontend import symbols as S
from gsv_tts_tpu.frontend import pause
from gsv_tts_tpu.frontend.lang_segment import LangSegment
from gsv_tts_tpu.frontend import text_processor as tp
from gsv_tts_tpu.frontend.g2p import zh_norm, en_norm
from gsv_tts_tpu.frontend.g2p.chinese import split_full_pinyin
from gsv_tts_tpu.config import global_config
from conftest import import_reference_module

ZH_LEXICON = {
    "你": "ni3", "好": "hao3", "不": "bu4", "是": "shi4", "一": "yi1",
    "个": "ge4", "中": "zhong1", "国": "guo2", "人": "ren2", "我": "wo3",
    "爱": "ai4", "恩": "en1", "天": "tian1", "气": "qi4", "真": "zhen1",
    "很": "hen3", "也": "ye3", "雨": "yu3", "儿": "er2", "女": "nv3",
    "花": "hua1", "点": "dian3", "分": "fen1", "之": "zhi1", "百": "bai3",
    "十": "shi2", "二": "er4", "三": "san1", "四": "si4", "五": "wu3",
    "六": "liu4", "七": "qi1", "八": "ba1", "九": "jiu3", "零": "ling2",
    "年": "nian2", "月": "yue4", "日": "ri4", "到": "dao4", "负": "fu4",
    "母": "mu3", "度": "du4", "千": "qian1", "万": "wan4", "亿": "yi4",
    "幺": "yao1", "下": "xia4", "们": "men5", "子": "zi3", "看": "kan4",
}


@pytest.fixture(autouse=True)
def zh_lexicon():
    """Install a tiny pinyin lexicon backend (pypinyin is absent here)."""
    from gsv_tts_tpu.frontend.g2p.chinese import ChineseG2P

    global_config.chinese_g2p = ChineseG2P(lexicon=ZH_LEXICON)
    yield
    global_config.chinese_g2p = None


def test_symbol_table_matches_reference():
    ref = import_reference_module("GPT_SoVITS/G2P/Symbols.py", "GPT_SoVITS.G2P.Symbols")
    assert S.symbols == ref.symbols
    assert len(S.symbols) == 732
    assert S.symbol_to_id["a1"] == ref.symbols.index("a1")


def test_pause_map_matches_reference():
    ref = import_reference_module("GPT_SoVITS/G2P/Pause.py", "GPT_SoVITS.G2P.Pause")
    assert pause.pause_map == ref.pause_map


@pytest.mark.parametrize("pinyin,expected", [
    ("zhong", ("zh", "ong")), ("guo", ("g", "uo")), ("a", ("AA", "a")),
    ("e", ("EE", "e")), ("ou", ("OO", "ou")), ("yi", ("y", "i")),
    ("ye", ("y", "E")), ("yan", ("y", "En")), ("wu", ("w", "u")),
    ("wei", ("w", "ui")), ("zhi", ("zh", "ir")), ("zi", ("z", "i0")),
    ("ju", ("j", "v")), ("jun", ("j", "vn")), ("juan", ("j", "van")),
    ("jue", ("j", "ve")), ("nv", ("n", "v")), ("lve", ("l", "ve")),
    ("yu", ("y", "v")), ("yuan", ("y", "van")), ("er", ("EE", "er")),
    ("shui", ("sh", "ui")), ("liu", ("l", "iu")), ("lun", ("l", "un")),
])
def test_split_full_pinyin(pinyin, expected):
    assert split_full_pinyin(pinyin) == expected


def test_split_pinyin_symbols_are_valid():
    """Every syllable the splitter can emit must map into the symbol table."""
    import itertools
    bases = list("abcdefghijklmnopqrstuvwxyz")
    # enumerate syllables the splitter accepts from common spellings
    from gsv_tts_tpu.frontend.g2p.chinese import INITIALS, Y_FINALS, W_FINALS, ZERO_INITIAL
    finals = ["a", "ai", "an", "ang", "ao", "e", "ei", "en", "eng", "i",
              "ia", "ian", "iang", "iao", "ie", "in", "ing", "iong", "iu",
              "o", "ong", "ou", "u", "ua", "uai", "uan", "uang", "ui", "un",
              "uo", "v", "ve"]
    for ini in INITIALS:
        for fin in finals:
            parts = split_full_pinyin(ini + fin)
            if parts is None:
                continue
            c, v = parts
            for tone in "12345":
                if v + tone in S.symbol_set:
                    assert c in S.symbol_set, (ini + fin, c)
    for spelled in list(Y_FINALS) + list(W_FINALS) + list(ZERO_INITIAL):
        c, v = split_full_pinyin(spelled)
        assert c in S.symbol_set, spelled
        assert v + "1" in S.symbol_set, spelled


def test_lang_segment_mixed():
    segs = LangSegment.getTexts("你好hello世界こんにちは")
    langs = [s["lang"] for s in segs]
    # en segments gain a trailing space (reference _insert_english_uppercase)
    joined = "".join(s["text"] for s in segs).replace(" ", "")
    assert joined == "你好hello世界こんにちは"
    assert langs[0] == "zh" and "en" in langs and "ja" in langs


def test_lang_segment_tags():
    # NOTE: matching the reference, the short-CJK post-pass runs AFTER tag
    # handling, so a 1-char zh-tagged segment next to ja is pulled to ja
    # (LangSegment.py:344-377); a longer zh-tagged run keeps its tag.
    segs = LangSegment.getTexts("<ja>雨</ja>と<zh>雨</zh>")
    assert [s["lang"] for s in segs] == ["ja", "ja"]
    segs = LangSegment.getTexts("<zh>今天天气真好一起出去</zh>と<ja>雨</ja>")
    assert segs[0]["lang"] == "zh"


def test_lang_segment_oracle_parity():
    """Segment-exact parity vs the reference LangSegment (scripts, tags,
    digits, half-width kana, acronym splitting, short-CJK smoothing).
    py3langid is stubbed identically on both sides."""
    stubbed = "py3langid" not in sys.modules
    if stubbed:
        m = types.ModuleType("py3langid")
        m.classify = lambda t: ("en", 0.0)
        sys.modules["py3langid"] = m
    try:
        ref_mod = import_reference_module("LangSegment.py", "LangSegment")
        cases = [
            "你好hello世界こんにちは",
            "<ja>雨</ja>と<zh>雨</zh>",
            "안녕하세요 hello",
            "今天天气真好。Let's go out!",
            "これはテストです。This is a test. 这是测试。",
            "GPT-SoVITS是一个TTS系统",
            "数字123と漢字",
            "ｶﾀｶﾅ半角とカタカナ全角",
            "简体中文繁體中文どっち",
            "hello world",
            "こんにちは",
            "你好",
            "ABC是DEF",
            "iPhone手机很好用",
            "今日はHello昨日はGoodbye",
        ]
        for c in cases:
            r = [(s["lang"], s["text"])
                 for s in ref_mod.LangSegment.getTexts(c)]
            m2 = [(s["lang"], s["text"]) for s in LangSegment.getTexts(c)]
            assert r == m2, c
    finally:
        if stubbed:
            sys.modules.pop("py3langid", None)


def test_lang_segment_korean():
    segs = LangSegment.getTexts("안녕하세요 hello")
    assert segs[0]["lang"] == "ko"


def test_cut_text_reassembles():
    text = "今天天气真好，我们一起出去玩吧。明天也要加油哦！Keep going, and never give up. 好的。"
    cuts = tp.cut_text(text, cut_minlen=6)
    assert "".join(cuts) == text
    for c in cuts[:-1]:
        assert tp.get_semantic_length(c) >= 1


def test_cut_text_leading_punct_repair():
    cuts = tp.cut_text("好。！？真的很好呀今天。", cut_minlen=2)
    for c in cuts[1:]:
        assert c[0] not in "!！?？.。"
    assert "".join(cuts) == "好。！？真的很好呀今天。"


def test_zh_norm_numbers():
    assert zh_norm.num_to_zh("0") == "零"
    assert zh_norm.num_to_zh("10") == "十"
    assert zh_norm.num_to_zh("14") == "十四"
    assert zh_norm.num_to_zh("105") == "一百零五"
    assert zh_norm.num_to_zh("1234") == "一千二百三十四"
    assert zh_norm.num_to_zh("10005") == "一万零五"
    assert zh_norm.num_to_zh("200000000") == "二亿"
    assert zh_norm.decimal_to_zh("3.14") == "三点一四"
    assert zh_norm.decimal_to_zh("-5") == "负五"


def test_zh_norm_patterns():
    assert "二零二四年一月五日" in zh_norm.normalize("2024年1月5日")
    assert "三点" in zh_norm.normalize("下午3:00开会")
    assert "百分之五十" in zh_norm.normalize("涨了50%")
    assert "三分之一" in zh_norm.normalize("约1/3的人")
    out = zh_norm.normalize("13812345678")
    assert "幺三八幺二三四五六七八" == out


def test_zh_norm_oracle_parity():
    """Full-pipeline parity vs the reference TextNormalizer
    (G2P/Chinese/Normalization/text_normlization.py) on a broad corpus plus
    deterministic fuzz around quantifiers, units, and separators."""
    import random
    import types

    # the reference constants.py only needs pypinyin for a UCS4 flag; stub it
    # just for the oracle import and remove the stub afterwards so the gated
    # real-pypinyin paths elsewhere keep seeing the true environment
    stubbed = "pypinyin" not in sys.modules
    if stubbed:
        pp = types.ModuleType("pypinyin")
        ppc = types.ModuleType("pypinyin.constants")
        ppc.SUPPORT_UCS4 = True
        pp.constants = ppc
        sys.modules["pypinyin"] = pp
        sys.modules["pypinyin.constants"] = ppc
    try:
        tn_mod = import_reference_module(
            "GPT_SoVITS/G2P/Chinese/Normalization/text_normlization.py",
            "GPT_SoVITS.G2P.Chinese.Normalization.text_normlization")
    finally:
        if stubbed:
            sys.modules.pop("pypinyin", None)
            sys.modules.pop("pypinyin.constants", None)
    ref = tn_mod.TextNormalizer()

    cases = [
        "2024年1月5日", "24年12月31号", "2024/03/05", "2024-03-05",
        "2024.03.05", "下午3:00开会", "8:05起床", "8:30-12:30营业",
        "12:45:30", "19:30", "气温-3°C到5℃", "水温25摄氏度", "3°C~10°C",
        "5kg重", "100km远", "10cm²", "1+2=3", "2³次", "x²+y²=z²",
        "约1/3的人", "涨了50%", "-20%", "13812345678", "+86 13912345678",
        "010-12345678", "400-123-4567", "4001234567", "3-5天", "10~20个",
        "-42", "v2.4.1", "版本1.0.0.3", "3.14", "3.20", "0.5", ".25",
        "-5.5", "2个人", "3多只", "12个", "2两酒", "200元", "5+个",
        "几百个", "123", "00078", "1234", "56", "9999", "10005",
        # bare scale words ARE quantifiers (COM_QUANTIFIERS branches) so
        # 二→两 fires; ％/～ stay full-width (letters/digits-only F2H);
        # "m" replaces before "mm" (reference measure_dict order) — all
        # three diverged before r3's review pass
        "2万人", "2千块", "有2百个", "50％的人", "3～5个", "5mm宽",
        "3亿元", "2克", "2千克", "2小时", "2美元", "2十吨", "2公分",
        "ＡＢＣ１２３", "2毫米", "3m", "2次",
        "200000000", "①号②号", "α射线和β射线", "我有3本书和2只猫",
        "他说5%的概率", "电话是123456789", "序号007", "共12345678人",
        "2次会议", "读3遍", "下午2点", "重2公斤", "3.00元", "第10⁵个",
        "6:30:15到了", "15:45~16:00", "2米布", "买2斤肉", "2小时后",
        "2分钟", "零下5度", "-7.5℃",
    ]
    rng = random.Random(0)
    quants = "个 只 本 条 小时 分钟 次 点 克 千克 元 岁".split()
    for _ in range(200):
        n = rng.choice(["2", "12", "105", "3.5", "-8", "0", "2024",
                        str(rng.randint(0, 10 ** rng.randint(1, 10)))])
        q = rng.choice(quants)
        pat = rng.choice(["我要{n}{q}。", "{n}{q}", "大约{n}多{q}吧",
                          "{n}~{m}{q}", "{n}-{m}", "{n}%", "{n}/7", "{n}:30",
                          "{n}年", "{n}日", "{n}+{m}=9", "{n}號{q}"])
        cases.append(pat.format(n=n, q=q, m=str(rng.randint(0, 999))))

    for c in cases:
        assert "".join(ref.normalize(c)) == zh_norm.normalize(c), c


def test_tone_sandhi_oracle_parity():
    """modified_tone + pre_merge_for_modify parity vs the reference
    ToneSandhi (G2P/Chinese/tone_sandhi.py) across rule-triggering words,
    POS tags, and randomized/forced tone patterns."""
    import random

    calls = {}

    def fake_lazy_pinyin(word, neutral_tone_with_five=True, style=None):
        return calls.get(word, ["a3"] * len(word))

    stubbed = "pypinyin" not in sys.modules
    if stubbed:
        pp = types.ModuleType("pypinyin")
        pp.lazy_pinyin = fake_lazy_pinyin
        pp.Style = types.SimpleNamespace(FINALS_TONE3=9, TONE3=8)
        ppc = types.ModuleType("pypinyin.constants")
        ppc.SUPPORT_UCS4 = True
        pp.constants = ppc
        sys.modules["pypinyin"] = pp
        sys.modules["pypinyin.constants"] = ppc
    # force a fresh exec so the reference module binds THIS test's stub
    for k in [k for k in sys.modules
              if k.startswith("refpkg.GPT_SoVITS.G2P.Chinese")]:
        del sys.modules[k]
    try:
        ts_mod = import_reference_module(
            "GPT_SoVITS/G2P/Chinese/tone_sandhi.py",
            "GPT_SoVITS.G2P.Chinese.tone_sandhi")
    finally:
        if stubbed:
            sys.modules.pop("pypinyin", None)
            sys.modules.pop("pypinyin.constants", None)
    ref = ts_mod.ToneSandhi()

    from gsv_tts_tpu.frontend.g2p.tone_sandhi import ToneSandhi

    mine = ToneSandhi(finals_fn=fake_lazy_pinyin)

    rng = random.Random(0)
    words = ["妈妈", "试试", "看不懂", "不怕", "好不好", "看一看", "第一名",
             "一段", "一天", "一", "二一零", "老虎", "纸老虎", "蒙古包",
             "所有人", "好喜欢", "展览馆", "小小鸟", "了", "着", "过", "走了",
             "孩子们", "桌子", "男子", "桌上", "家里", "上来", "下去", "三个",
             "几个人", "半个", "个", "麻烦", "东西", "喜欢", "漂亮", "石头",
             "时候", "什么时候", "耳朵", "人人", "哈哈", "想想", "豆腐",
             "点心", "风筝", "骨头", "老实", "我们", "柱子", "椅子", "瓜子",
             "电子", "以下", "可爱吧", "好的", "走吧", "真哒", "来哟", "水果",
             "雨伞", "勇敢", "理想", "美好"]

    def rand_finals(w):
        return [rng.choice("aeiou") + rng.choice("in") + rng.choice("12345")
                for _ in w]

    for w in words:
        for pos in ["n", "v", "a", "d", "r", "s", "l", "f", "ul", "uz",
                    "ug", "m"]:
            for trial in range(4):
                f = rand_finals(w)
                if trial == 1:
                    f = [x[:-1] + "3" for x in f]
                if trial == 2 and len(f) > 1:
                    f = [x[:-1] + "3" for x in f[:-1]] + [f[-1][:-1] + "4"]
                if trial == 3 and len(f) > 1:
                    f = [f[0][:-1] + "3"] + [x[:-1] + "3" for x in f[1:]]
                assert ref.modified_tone(w, pos, list(f)) == \
                    mine.modified_tone(w, pos, list(f)), (w, pos, f)

    calls.update({"听": ["ing1"], "一": ["i1"], "不": ["u4"], "怕": ["a4"],
                  "好": ["ao3"], "妈": ["a1"], "花": ["ua1"], "儿": ["er2"],
                  "天": ["ian1"], "展": ["an3"], "览": ["an3"], "馆": ["uan3"],
                  "雨伞": ["v3", "an3"], "小": ["iao3"],
                  "老虎": ["ao3", "u3"], "走": ["ou3"], "了": ["e5"],
                  "吗": ["a5"]})
    segs = [
        [("听", "v"), ("一", "m"), ("听", "v")],
        [("不", "d"), ("怕", "v")],
        [("好", "a"), ("不", "d"), ("好", "a")],
        [("妈", "n"), ("妈", "n")],
        [("花", "n"), ("儿", "n")],
        [("一", "m"), ("天", "n")],
        [("展", "v"), ("览", "v"), ("馆", "n")],
        [("好", "a"), ("雨伞", "n")],
        [("小", "a"), ("老虎", "n")],
        [("不", "d")],
        [("走", "v"), ("了", "ul"), ("吗", "y")],
    ]
    for s in segs:
        r = [tuple(x) for x in ref.pre_merge_for_modify([list(x) for x in s])]
        m = [tuple(x) for x in mine.pre_merge_for_modify(list(s))]
        assert r == m, s


def test_zh_g2p_end_to_end_oracle_parity(tmp_path):
    """Whole-pipeline parity vs the reference ChineseG2P
    (G2P/Chinese/chinese.py): jieba segmentation → pre-merge → sandhi →
    erhua → opencpop symbol mapping → word2ph. pypinyin is stubbed on the
    reference side with strict INITIALS/FINALS_TONE3 derived from the same
    lexicon this repo's G2P uses, so both pipelines share pinyin ground
    truth and the test verifies all the glue."""
    from gsv_tts_tpu.frontend.g2p.chinese import (ChineseG2P,
                                                  split_full_pinyin, INITIALS)

    mine = ChineseG2P(lexicon=ZH_LEXICON)

    strict_y = {"yi": "i", "ya": "ia", "yan": "ian", "yang": "iang",
                "yao": "iao", "ye": "ie", "yin": "in", "ying": "ing",
                "yo": "io", "yong": "iong", "you": "iou", "yu": "v",
                "yuan": "van", "yue": "ve", "yun": "vn"}
    strict_w = {"wu": "u", "wa": "ua", "wai": "uai", "wan": "uan",
                "wang": "uang", "wei": "uei", "wen": "uen", "weng": "ueng",
                "wo": "uo"}

    def full_to_strict(py):
        m = re.match(r"([a-zü:v]+)([1-5])$", py)
        if not m:
            return py, py
        base, tone = m.groups()
        base = base.replace("ü", "v").replace("u:", "v")
        if base in strict_y:
            return "", strict_y[base] + tone
        if base in strict_w:
            return "", strict_w[base] + tone
        for ini in INITIALS:
            if base.startswith(ini) and len(base) > len(ini):
                fin = base[len(ini):]
                if ini in ("j", "q", "x"):
                    fin = {"u": "v", "un": "vn", "uan": "van",
                           "ue": "ve"}.get(fin, fin)
                fin = {"ui": "uei", "iu": "iou", "un": "uen",
                       "ue": "ve"}.get(fin, fin)
                return ini, fin + tone
        return "", base + tone

    style = types.SimpleNamespace(INITIALS=1, FINALS_TONE3=2)

    def fake_lazy_pinyin(word, neutral_tone_with_five=True, style_=None,
                         **kw):
        sty = kw.get("style", style_)
        pys = mine._word_pinyins(word)
        if sty == style.INITIALS:
            return [full_to_strict(p)[0] for p in pys]
        return [full_to_strict(p)[1] for p in pys]

    # synthesize opencpop-strict.txt over the lexicon's derived lookup keys
    def derived_key(c, v_toneless):
        if c:
            return c + {"uei": "ui", "iou": "iu",
                        "uen": "un"}.get(v_toneless, v_toneless)
        p = v_toneless
        pm = {"ing": "ying", "i": "yi", "in": "yin", "u": "wu"}
        if p in pm:
            return pm[p]
        sm = {"v": "yu", "e": "e", "i": "y", "u": "w"}
        return sm[p[0]] + p[1:] if p[0] in sm else p

    keys = set()
    for py in ZH_LEXICON.values():
        c, v = full_to_strict(py)
        keys.add(derived_key(c, v[:-1]))
    d = tmp_path / "g2p" / "zh"
    d.mkdir(parents=True)
    lines = []
    for k in sorted(keys):
        ini, fin = split_full_pinyin(k)
        lines.append(f"{k}\t{ini} {fin}")
    (d / "opencpop-strict.txt").write_text("\n".join(lines) + "\n", "utf-8")

    stubbed = "pypinyin" not in sys.modules
    if stubbed:
        pp = types.ModuleType("pypinyin")
        pp.lazy_pinyin = fake_lazy_pinyin
        pp.Style = style
        ppc = types.ModuleType("pypinyin.constants")
        ppc.SUPPORT_UCS4 = True
        pp.constants = ppc
        sys.modules["pypinyin"] = pp
        sys.modules["pypinyin.constants"] = ppc
    # force a fresh exec so the reference modules bind THIS test's stub
    for k in [k for k in sys.modules
              if k.startswith("refpkg.GPT_SoVITS.G2P.Chinese")]:
        del sys.modules[k]
    try:
        ref_mod = import_reference_module(
            "GPT_SoVITS/G2P/Chinese/chinese.py",
            "GPT_SoVITS.G2P.Chinese.chinese")
        ref = ref_mod.ChineseG2P(str(tmp_path))
        texts = [
            "你好。", "我是中国人。", "天气真好，很好。", "看一看。",
            "一个人也不是。", "三分之一。", "二零二四年八月十六日。",
            "你们是好人。", "雨下一天。", "女儿花儿。", "万亿千百十。",
            "不好不是。", "很雨好。", "你好你好。",
        ]
        for t in texts:
            rp, rw = ref.g2p(t)
            mp, mw = mine.g2p(t)
            assert rp == mp, t
            assert rw == mw, t
    finally:
        if stubbed:
            sys.modules.pop("pypinyin", None)
            sys.modules.pop("pypinyin.constants", None)


def test_en_norm_oracle_parity():
    """Pipeline parity vs the reference English normalizer
    (G2P/English/Normalization/expend.py). The reference's `inflect`
    dependency is satisfied by this repo's interface-compatible MiniInflect
    so both sides share number wording and the test verifies every pipeline
    stage. Hyphens map to spaces (documented divergence: we split inflect's
    hyphenated numbers instead of relying on wordsegment downstream)."""
    fake = types.ModuleType("inflect")
    fake.engine = lambda: en_norm.MiniInflect()
    stubbed = "inflect" not in sys.modules
    if stubbed:
        sys.modules["inflect"] = fake
    for k in [k for k in sys.modules
              if k.startswith("refpkg.GPT_SoVITS.G2P.English")]:
        del sys.modules[k]
    try:
        ref_mod = import_reference_module(
            "GPT_SoVITS/G2P/English/Normalization/expend.py",
            "GPT_SoVITS.G2P.English.Normalization.expend")
    finally:
        if stubbed:
            sys.modules.pop("inflect", None)

    cases = [
        "in 1997", "the year 2000", "back in 2005", "around 1800",
        "room 302", "pi is 3.14", "50% off", "$5 only", "$6.24 total",
        "32.3$ spent", "£1 coin", "£2.50 fare", "99£ fine", "1/2 cup",
        "3/4 done", "5/6 left", "3/2 ratio", "7/1 odds", "meet at 13:00",
        "it is 4:05", "at 13:30 sharp", "run 5km today", "wait 1h",
        "add 2tbsp sugar", "about 100m away", "1min left", "water at 25°C",
        "98°F fever", "1. first item", "12,000 people", "1,234,567 total",
        "the 21st century", "3rd place", "2nd try", "1 + 2 = 3",
        "x - 1 = 0", "NASA and FBI", "the iPhone", "i.e. this", "e.g. that",
        "café menu", "naïve approach", "-42 degrees", " -7 below",
        "score 1000", "scored 2999", "at 1100 hours", "2010 era",
        "0.5 percent", "a 2kg bag", "13. 234 item", "2 × 3 = 6",
        "10 ÷ 2 = 5",
    ]
    # deterministic fuzz mirroring the zh-normalizer suite: numbers through
    # every expend.py stage (years, money, percent, time, fractions,
    # ordinals, measures, decimals, grouping) at varied magnitudes/signs
    import random

    rng = random.Random(0)
    units = ["km", "m", "cm", "kg", "g", "h", "min", "s", "tbsp", "tsp",
             "ml", "mph"]
    for _ in range(280):
        n = rng.choice([
            str(rng.randint(0, 9)), str(rng.randint(10, 99)),
            str(rng.randint(100, 999)), str(rng.randint(1000, 9999)),
            str(rng.randint(10000, 10 ** 7)),
            f"{rng.randint(0, 99)}.{rng.randint(0, 999)}",
            f"{rng.randint(1, 9)},{rng.randint(100, 999)}",
        ])
        m = str(rng.randint(1, 59))
        pat = rng.choice([
            "about {n} items", "in {n}", "the {n}th time", "{n}% done",
            "${n} total", "£{n} fare", "{n}$ spent", "{n}£ fine",
            "{n}/{m} of it", "meet at {h}:{mm}", "{n} + {m} = x",
            "{n} - {m} = y", "wait {n}{u}", "run {n}{u} fast",
            "a {n}{u} bag", "{n}. listed item", "it costs {n} dollars",
            "temperature {n}°C", "about -{n} below", "room {n}",
        ])
        c = pat.format(n=n, m=m, u=rng.choice(units),
                       h=rng.randint(0, 23), mm=f"{rng.randint(0, 59):02d}")
        cases.append(c)

    assert len(cases) >= 300
    for c in cases:
        assert ref_mod.normalize(c).replace("-", " ") == en_norm.normalize(c), c


def test_en_norm():
    assert en_norm.int_to_words(0) == "zero"
    assert en_norm.int_to_words(21) == "twenty one"
    assert en_norm.int_to_words(105) == "one hundred five"
    assert en_norm.int_to_words(1234) == "one thousand two hundred thirty four"
    assert en_norm.ordinal_words(3) == "third"
    assert en_norm.ordinal_words(22) == "twenty second"
    assert "nineteen ninety seven" in en_norm.normalize("in 1997")
    assert "three point one four" in en_norm.normalize("pi is 3.14")
    assert "fifty percent" in en_norm.normalize("50% off")
    assert "five dollars" in en_norm.normalize("$5 only")


def test_text_to_phonemes_zh_invariants():
    from gsv_tts_tpu.frontend.g2p import text_to_phonemes

    phones, word2ph, norm = text_to_phonemes("你好，中国人。", "zh")
    assert len(phones) == sum(word2ph["ph"])
    assert all(p in S.symbol_set for p in phones)
    # 你(3rd)好(3rd) → third-tone sandhi: ni2 hao3
    i_n = phones.index("n")
    assert phones[i_n + 1] == "i2"
    assert "h" in phones and "ao3" in phones


def test_text_to_phonemes_zh_bu_yi_sandhi():
    from gsv_tts_tpu.frontend.g2p import text_to_phonemes

    phones, _, _ = text_to_phonemes("不是", "zh")
    assert "u2" in phones  # bu4 → bu2 before 4th tone
    phones, _, _ = text_to_phonemes("一个", "zh")
    assert "i2" in phones  # yi1 → yi2 before 4th tone


def test_text_to_phonemes_en_invariants():
    from gsv_tts_tpu.frontend.g2p import text_to_phonemes

    phones, word2ph, norm = text_to_phonemes("Hello world, it costs $5.", "en")
    assert len(phones) == sum(word2ph["ph"])
    assert all(p in S.symbol_set for p in phones)
    assert len(phones) > 5


def test_text_to_phonemes_ja_kana():
    from gsv_tts_tpu.frontend.g2p import text_to_phonemes

    phones, word2ph, norm = text_to_phonemes("こんにちは。", "ja")
    assert len(phones) == sum(word2ph["ph"])
    assert all(p in S.symbol_set for p in phones)
    # こんにちは → k o N n i ch i w a
    assert phones[:3] == ["k", "o", "N"]


def test_get_phones_and_bert():
    from gsv_tts_tpu.config import Config

    cfg = Config(dtype="float32")
    phones, word2ph, bert, norm = tp.get_phones_and_bert("你好hello", cfg)
    assert bert.shape == (len(phones), 1024)
    assert np.all(bert == 0)
    # batch mode
    ph_b, w_b, b_b, n_b = tp.get_phones_and_bert(["你好", "hello"], cfg)
    assert len(ph_b) == 2 and b_b[0].shape[0] == len(ph_b[0])


def _load_ref_textprocessor():
    # stub unavailable deps of the reference module
    for name in ("pysbd", "py3langid"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name == "pysbd":
                class Segmenter:
                    def segment(self, text):
                        return [text]
                m.Segmenter = Segmenter
            else:
                m.classify = lambda t: ("zh", 0.0)
            sys.modules[name] = m
    import_reference_module("LangSegment.py", "LangSegment")
    import_reference_module("Config.py", "Config")
    import_reference_module("GPT_SoVITS/G2P/Symbols.py", "GPT_SoVITS.G2P.Symbols")
    import_reference_module("GPT_SoVITS/G2P/Pause.py", "GPT_SoVITS.G2P.Pause")
    import_reference_module("GPT_SoVITS/G2P/__init__.py", "GPT_SoVITS.G2P")
    return import_reference_module("TextProcessor.py", "TextProcessor")


def test_subtitle_mapping_parity():
    """LIS / interpolation / sub2text_index parity with the reference."""
    ref = _load_ref_textprocessor()
    rng = np.random.RandomState(0)
    for _ in range(20):
        cand = [sorted(rng.choice(30, size=rng.randint(0, 4), replace=False).tolist())
                for _ in range(rng.randint(1, 12))]
        assert tp.LIS_mapping([list(c) for c in cand]) == ref.LIS_mapping([list(c) for c in cand])

    for _ in range(20):
        seq = [int(v) if rng.rand() > 0.4 else -1
               for v in np.sort(rng.choice(50, size=8, replace=False))]
        assert tp.linear_interpolate(list(seq)) == ref.linear_interpolate(list(seq))


def test_sub2text_index_parity():
    ref = _load_ref_textprocessor()
    norm_text = "今天天气真好一起出去玩吧"
    orig_text = "今天天气真好，一起出去玩吧!"
    subs = [{"text": "今天", "start_s": 0.0, "end_s": 0.4},
            {"text": "天气", "start_s": 0.4, "end_s": 0.8},
            {"text": "玩", "start_s": 1.2, "end_s": 1.5}]
    import copy
    a = tp.sub2text_index(copy.deepcopy(subs), norm_text, orig_text)
    b = ref.sub2text_index(copy.deepcopy(subs), norm_text, orig_text)
    assert a == b


def test_ja_prosody_oracle_parity():
    """Japanese prosody extraction parity vs the reference
    (G2P/Japanese/japanese.py pyopenjtalk_g2p_prosody) using hand-crafted
    HTS full-context labels through a stubbed pyopenjtalk: accent rise [,
    accent fall ], accent-phrase boundary #, question $/? endings, pau,
    unvoiced-vowel lowering, IDLE nodes, and the per-node word2ph split."""

    def lab(p3, a=None, f1=None, e3=None):
        s = f"xx^xx-{p3}+xx=xx"
        if a is not None:
            s += f"/A:{a[0]}+{a[1]}+{a[2]}/F:{f1}_0"
        else:
            s += "/A:xx"
        if e3 is not None:
            s += f"!{e3}_0"
        return s

    # 私(ワタシ w a t a sh i) は(ワ w a) 、(IDLE) 蛙(カエル k a e r U):
    # phrase1 ワタシワ heiban (rise after mora 1), phrase2 カエル accent 2
    # (fall after エ), question ending; U exercises unvoiced lowering.
    text = "私は、蛙"
    features = [
        {"string": "私", "pron": "ワタシ"},
        {"string": "は", "pron": "ワ"},
        {"string": "、", "pron": "IDLE"},
        {"string": "蛙", "pron": "カエル"},
    ]
    labels = [
        lab("sil"),
        lab("w", (1, 1, 4), 4), lab("a", (1, 1, 4), 4),
        lab("t", (2, 2, 3), 4), lab("a", (2, 2, 3), 4),
        lab("sh", (3, 3, 2), 4), lab("i", (3, 3, 2), 4),
        lab("w", (4, 4, 1), 4), lab("a", (4, 4, 1), 4),
        lab("k", (-1, 1, 3), 3), lab("a", (-1, 1, 3), 3),
        lab("e", (0, 2, 2), 3),
        lab("r", (1, 3, 1), 3), lab("U", (1, 3, 1), 3),
        lab("sil", e3=1),
    ]
    g2p_words = {"ワタシ": "w a t a sh i", "ワ": "w a", "カエル": "k a e r U"}

    pjt = types.ModuleType("pyopenjtalk")
    pjt.run_frontend = lambda t: features
    pjt.make_label = lambda f: labels
    pjt.g2p = lambda pron: g2p_words[pron]

    stubbed = "pyopenjtalk" not in sys.modules
    if stubbed:
        sys.modules["pyopenjtalk"] = pjt
    for k in [k for k in sys.modules
              if k.startswith("refpkg.GPT_SoVITS.G2P.Japanese")]:
        del sys.modules[k]
    try:
        ref_mod = import_reference_module(
            "GPT_SoVITS/G2P/Japanese/japanese.py",
            "GPT_SoVITS.G2P.Japanese.japanese")
        ref = ref_mod.JapaneseG2P()
        ref_w2p = {"word": [], "ph": []}
        ref_phones, ref_w2p = ref.pyopenjtalk_g2p_prosody(text, ref_w2p)

        from gsv_tts_tpu.frontend.g2p.japanese import JapaneseG2P

        mine = JapaneseG2P()
        assert mine._pyopenjtalk is not None
        my_w2p = {"word": [], "ph": []}
        my_phones = mine._openjtalk_prosody(text, my_w2p)
    finally:
        if stubbed:
            sys.modules.pop("pyopenjtalk", None)

    assert ref_phones[0] == "^" and ref_phones[-1] == "?"
    assert my_phones == ref_phones[1:-1]
    assert my_w2p == ref_w2p
    # structural sanity: the marks landed where the accent rules say
    assert my_phones == ["w", "a", "[", "t", "a", "sh", "i", "w", "a", "#",
                         "k", "a", "[", "e", "]", "r", "u"]
    assert my_w2p["word"] == ["私", "は", "蛙"]
    assert sum(my_w2p["ph"]) == len(my_phones)


def test_cut_text_oracle_parity():
    """cut_text clause-split / minlen-merge / leading-punct-repair parity vs
    the reference (TextProcessor.py:18-59), with pysbd stubbed by the SAME
    sentence splitter on both sides so the downstream logic is isolated."""
    from gsv_tts_tpu.frontend.text_processor import builtin_split_sentences

    pysbd_stub = sys.modules.get("pysbd")
    fresh = types.ModuleType("pysbd")

    class Segmenter:
        def segment(self, text):
            return builtin_split_sentences(text)

    fresh.Segmenter = Segmenter
    sys.modules["pysbd"] = fresh
    # the reference module binds `seg = pysbd.Segmenter()` at import time;
    # force a re-exec so it picks up THIS stub
    sys.modules.pop("refpkg.TextProcessor", None)
    try:
        ref = _load_ref_textprocessor()
        cases = [
            "今天天气真好，我们一起出去玩吧。明天也要加油哦！",
            "好。！？真的很好呀今天。",
            "Short. Also short. And a third one here, with commas, yes.",
            "一句超级长的话，有很多很多的逗号，一直说个不停，直到结束。",
            "\n\n开头有换行。然后继续。",
            "только одно предложение без знаков",
            "多句。短。话。每。句。都。很。短。",
            "Mixed 中文 and English, numbers 123, and pauses; more text here.",
            "……省略号开头。正文在这里，继续说话。",
        ]
        for minlen in (2, 6, 10, 25):
            for c in cases:
                assert ref.cut_text(c, minlen) == tp.cut_text(c, minlen), \
                    (c, minlen)
    finally:
        if pysbd_stub is not None:
            sys.modules["pysbd"] = pysbd_stub
        else:
            sys.modules.pop("pysbd", None)
        sys.modules.pop("refpkg.TextProcessor", None)


def test_g2p_dispatcher_oracle_parity():
    """text_to_phonemes dispatcher parity vs the reference
    (G2P/__init__.py:16-77): ellipsis collapsing, pause-symbol mapping,
    UNK replacement, consecutive-punctuation dedup, and the backward
    word2ph repair. Both sides share THIS repo's G2P instances via the
    reference's global_config, isolating the dispatcher logic."""
    _load_ref_textprocessor()
    ref_g2p = sys.modules["refpkg.GPT_SoVITS.G2P"]
    ref_cfg = sys.modules["refpkg.Config"].global_config

    from gsv_tts_tpu.frontend import g2p as my_g2p
    from gsv_tts_tpu.frontend.g2p.japanese import JapaneseG2P

    ja = JapaneseG2P()
    old = (ref_cfg.chinese_g2p, getattr(ref_cfg, "japanese_g2p", None),
           getattr(ref_cfg, "english_g2p", None))
    ref_cfg.chinese_g2p = global_config.chinese_g2p  # lexicon-backed fixture
    ref_cfg.japanese_g2p = ja
    my_old_ja = global_config.japanese_g2p
    global_config.japanese_g2p = ja  # avoid lazy init under the stub below
    # the reference dispatcher imports its Chinese/Japanese modules even when
    # an instance is injected; satisfy those imports only (never called —
    # and `ja` above was constructed BEFORE the stub, so it keeps the kana
    # fallback rather than picking up the stub)
    stubs = {}
    for name in ("pypinyin", "pyopenjtalk"):
        if name not in sys.modules:
            m = types.ModuleType(name)
            if name == "pypinyin":
                m.lazy_pinyin = lambda *a, **k: []
                m.Style = types.SimpleNamespace(INITIALS=1, FINALS_TONE3=2)
                mc = types.ModuleType("pypinyin.constants")
                mc.SUPPORT_UCS4 = True
                m.constants = mc
                sys.modules["pypinyin.constants"] = mc
            stubs[name] = m
            sys.modules[name] = m
    try:
        # make `from .Chinese import ChineseG2P` (and Japanese) resolvable
        # regardless of which placeholder modules earlier tests left behind
        import_reference_module("GPT_SoVITS/G2P/Chinese/__init__.py",
                                "GPT_SoVITS.G2P.Chinese")
        import_reference_module("GPT_SoVITS/G2P/Japanese/__init__.py",
                                "GPT_SoVITS.G2P.Japanese")
        cases = [
            ("你好，，不是。。。一个人", "zh"),   # dup pause + ellipsis collapse
            ("你好。。。。", "zh"),
            ("三分之一，是不是？？", "zh"),
            ("こんにちは、、", "ja"),
            ("カタカナ！！！", "ja"),
        ]
        for text, lang in cases:
            rp, rw, rn = ref_g2p.text_to_phonemes(text, lang)
            mp, mw, mn = my_g2p.text_to_phonemes(text, lang)
            assert rp == mp, (text, lang)
            assert rw == mw, (text, lang)
            assert rn == mn, (text, lang)
            assert len(mp) == sum(mw["ph"])
            assert ref_g2p.phonemes_to_ids(rp) == my_g2p.phonemes_to_ids(mp)
    finally:
        ref_cfg.chinese_g2p, ref_cfg.japanese_g2p, ref_cfg.english_g2p = old
        global_config.japanese_g2p = my_old_ja
        for name in stubs:
            sys.modules.pop(name, None)
        if "pypinyin" in stubs:
            sys.modules.pop("pypinyin.constants", None)


def _make_en_models_dir(tmp_path):
    """Synthetic English G2P asset bundle (cmudict/fast/hot + GRU npz +
    homographs.en + namedict) shared by ours and the reference oracle."""
    import pickle

    from gsv_tts_tpu.frontend.g2p import en_oov
    from gsv_tts_tpu.frontend.g2p.english import LETTER_PRON

    base = tmp_path / "g2p" / "en"
    (base / "g2p_en").mkdir(parents=True)

    words = {
        "the": "DH AH0", "a": "AH0", "an": "AE1 N", "i": "AY1",
        "you": "Y UW1", "he": "HH IY1", "she": "SH IY1", "we": "W IY1",
        "they": "DH EY1", "it": "IH1 T", "is": "IH1 Z", "was": "W AA1 Z",
        "will": "W IH1 L", "would": "W UH1 D", "to": "T UW1",
        "and": "AH0 N D", "of": "AH1 V", "in": "IH0 N", "on": "AA1 N",
        "this": "DH IH1 S", "that": "DH AE1 T", "with": "W IH1 DH",
        "book": "B UH1 K", "books": "B UH1 K S", "cat": "K AE1 T",
        "dog": "D AO1 G", "house": "HH AW1 S", "water": "W AO1 T ER0",
        "play": "P L EY1", "station": "S T EY1 SH AH0 N",
        "fire": "F AY1 ER0", "fly": "F L AY1", "ground": "G R AW1 N D",
        "breaking": "B R EY1 K IH0 NG", "news": "N UW1 Z",
        "yesterday": "Y EH1 S T ER0 D EY2", "today": "T AH0 D EY1",
        "strong": "S T R AO1 NG", "rope": "R OW1 P", "near": "N IH1 R",
        "wire": "W AY1 ER0", "please": "P L IY1 Z", "good": "G UH1 D",
        "very": "V EH1 R IY0", "big": "B IH1 G", "new": "N UW1",
        "singer": "S IH1 NG ER0", "metal": "M EH1 T AH0 L",
        "john": "JH AA1 N", "johns": "JH AA1 N Z", "mary": "M EH1 R IY0",
        "time": "T AY1 M", "people": "P IY1 P AH0 L", "go": "G OW1",
        "went": "W EH1 N T", "see": "S IY1", "saw": "S AO1",
        "music": "M Y UW1 Z IH0 K", "about": "AH0 B AW1 T",
        "ae": "EY1 IY1", "ai": "EY1 AY1", "ar": "EY1 AA1 R",
        "ios": "AY1 OW0 EH1 S", "hud": "HH AH1 D", "os": "OW1 EH1 S",
    }
    # homograph words must also exist in the dict (dict hit is shadowed by
    # the homograph branch, but qryword recursion may land on them)
    words.update({
        "read": "R EH1 D", "record": "R EH1 K ER0 D",
        "wind": "W IH1 N D", "live": "L IH1 V", "lead": "L IY1 D",
        "present": "P R EH1 Z AH0 N T", "close": "K L OW1 S",
        "use": "Y UW1 S", "tear": "T IH1 R", "object": "AA1 B JH EH0 K T",
        "content": "K AA1 N T EH0 N T", "desert": "D EH1 Z ER0 T",
        "project": "P R AA1 JH EH0 K T", "bow": "B OW1",
        "minute": "M IH1 N AH0 T", "complex": "K AA1 M P L EH0 K S",
    })
    for ch, pron in LETTER_PRON.items():
        words.setdefault(ch, " ".join(pron))

    lines = [";;; header"] * 56
    lines += [f"{w.upper()}  {p}" for w, p in sorted(words.items())]
    (base / "cmudict.rep").write_text("\n".join(lines) + "\n")
    (base / "cmudict-fast.rep").write_text(
        "zebra Z IY1 B R AH0\nquokka K W AA1 K AH0\n")
    (base / "engdict-hot.rep").write_text("gsv JH IY1 EH1 S V IY1\n")

    rng = np.random.RandomState(0)
    shapes = {
        "enc_emb": (29, 64), "enc_w_ih": (384, 64), "enc_w_hh": (384, 128),
        "enc_b_ih": (384,), "enc_b_hh": (384,),
        "dec_emb": (74, 64), "dec_w_ih": (384, 64), "dec_w_hh": (384, 128),
        "dec_b_ih": (384,), "dec_b_hh": (384,),
        "fc_w": (74, 128), "fc_b": (74,),
    }
    np.savez(base / "g2p_en" / "checkpoint20.npz",
             **{k: (rng.randn(*s) * 0.4).astype(np.float32)
                for k, s in shapes.items()})

    hg_lines = [f"{w}|{' '.join(p1)}|{' '.join(p2)}|{pos1}"
                for w, (p1, p2, pos1) in sorted(en_oov.BUILTIN_HOMOGRAPHS.items())]
    (base / "g2p_en" / "homographs.en").write_text("\n".join(hg_lines) + "\n")

    with open(base / "namedict_cache.pickle", "wb") as f:
        pickle.dump({"xanthe": [["Z", "AE1", "N", "TH", "IY0"]],
                     "bronwyn": [["B", "R", "AA1", "N", "W", "IH0", "N"]]}, f)
    return tmp_path


def test_english_g2p_oracle_parity(tmp_path):
    """Full-chain parity vs the reference EnglishG2P
    (G2P/English/english.py + g2p_en.py) over mixed sentences: dictionary
    chain, homograph POS dispatch, namedict, ≤3-char spell-out, compound
    segmentation, and the GRU OOV seq2seq (random weights, exact numpy
    parity).  nltk's tagger/tokenizer and wordsegment are satisfied by THIS
    repo's implementations on both sides (same-engine injection, as with
    MiniInflect), isolating the G2P logic itself."""
    from gsv_tts_tpu.frontend.g2p import en_norm, en_pos
    from gsv_tts_tpu.frontend.g2p.english import EnglishG2P, _WORD_RE

    models_dir = _make_en_models_dir(tmp_path)
    ours = EnglishG2P(models_dir=str(models_dir))
    assert ours.gru_lts is not None  # npz asset picked up

    # --- stub nltk / wordsegment / inflect for the reference import ---
    class _Tok:
        def tokenize(self, text):
            return _WORD_RE.findall(text)

    nltk_stub = types.ModuleType("nltk")
    nltk_stub.pos_tag = en_pos.pos_tag
    nltk_stub.data = types.SimpleNamespace(path=[])
    tok_stub = types.ModuleType("nltk.tokenize")
    tok_stub.TweetTokenizer = _Tok
    nltk_stub.tokenize = tok_stub
    ws_stub = types.ModuleType("wordsegment")
    ws_stub.load = lambda: None
    ws_stub.segment = ours.segmenter.segment
    inflect_stub = types.ModuleType("inflect")
    inflect_stub.engine = lambda: en_norm.MiniInflect()

    saved = {k: sys.modules.get(k)
             for k in ("nltk", "nltk.tokenize", "wordsegment", "inflect")}
    for k in [k for k in sys.modules if k.startswith("refpkg.GPT_SoVITS.G2P")]:
        del sys.modules[k]
    sys.modules["nltk"] = nltk_stub
    sys.modules["nltk.tokenize"] = tok_stub
    sys.modules["wordsegment"] = ws_stub
    sys.modules["inflect"] = inflect_stub
    try:
        import_reference_module("GPT_SoVITS/G2P/Pause.py", "GPT_SoVITS.G2P.Pause")
        import_reference_module(
            "GPT_SoVITS/G2P/English/Normalization/expend.py",
            "GPT_SoVITS.G2P.English.Normalization.expend")
        import_reference_module("GPT_SoVITS/G2P/English/g2p_en.py",
                                "GPT_SoVITS.G2P.English.g2p_en")
        ref_mod = import_reference_module("GPT_SoVITS/G2P/English/english.py",
                                          "GPT_SoVITS.G2P.English.english")
        ref = ref_mod.EnglishG2P(str(models_dir))
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in [k for k in sys.modules if k.startswith("refpkg.GPT_SoVITS.G2P.English")]:
            del sys.modules[k]

    pools = {
        "noun": ["book", "cat", "dog", "house", "water", "music", "time",
                 "people", "news", "metal", "wire", "rope"],
        "homograph": ["read", "record", "wind", "live", "lead", "present",
                      "close", "use", "tear", "object", "content", "desert",
                      "project", "bow", "minute", "complex"],
        "oov": ["blorptastic", "quixotry", "vexnor", "playstation",
                "fireground", "watermusic", "zebra", "quokka", "gsv",
                "xq", "zzz", "Xanthe", "Bronwyn", "Unknownname"],
        "verbish": ["go", "went", "see", "saw", "play", "please"],
    }
    rng = np.random.RandomState(42)
    templates = [
        "I will {h} the {n}.", "He {h} it yesterday.",
        "Please {h} the {n}.", "The {h} was very {h2}.",
        "A strong {n} will {h} the {o}.", "They {v} near a {h} {n}.",
        "{o} is breaking news today.", "She saw the {o} and the {n}.",
        "We {v} to {h} about 12 {n}s.", "My {n} costs $5 today.",
        "{o} and {o2} went to the {n}.", "Did you {h} the {h2} {n}?",
    ]
    sentences = []
    for _ in range(300):
        t = rng.choice(templates)
        s = t.format(
            h=rng.choice(pools["homograph"]), h2=rng.choice(pools["homograph"]),
            n=rng.choice(pools["noun"]), o=rng.choice(pools["oov"]),
            o2=rng.choice(pools["oov"]), v=rng.choice(pools["verbish"]))
        sentences.append(s)

    mismatch = 0
    total_phones = 0
    for s in sentences:
        norm_ref = ref.text_normalize(s)
        norm_ours = ours.text_normalize(s)
        assert norm_ref == norm_ours, (s, norm_ref, norm_ours)
        ph_ref, w2p_ref = ref.g2p(norm_ref)
        ph_ours, w2p_ours = ours.g2p(norm_ours)
        total_phones += len(ph_ref)
        if ph_ref != ph_ours or w2p_ref["ph"] != w2p_ours["ph"]:
            mismatch += 1
    # VERDICT round-1 "done" bar: ≥99 % agreement over mixed sentences
    assert mismatch <= len(sentences) // 100, \
        f"{mismatch}/{len(sentences)} sentences diverged ({total_phones} phones)"


def test_en_pos_tagger_basics():
    from gsv_tts_tpu.frontend.g2p.en_pos import pos_tag

    tags = dict(pos_tag("I will read the book".split()))
    assert tags["read"].startswith("V")
    assert tags["book"].startswith("N")
    tags = dict(pos_tag("the wind was strong".split()))
    assert tags["wind"].startswith("N")
    tags = dict(pos_tag("please record the record".split()))
    assert pos_tag("please record the record".split())[1][1].startswith("V")
    assert pos_tag("please record the record".split())[3][1].startswith("N")
    tags = dict(pos_tag("she quickly closes the door".split()))
    assert tags["quickly"] == "RB"
    assert tags["closes"].startswith("V")


def test_en_segmenter_corpus_model(tmp_path):
    """Norvig-style segmentation with corpus statistics."""
    from gsv_tts_tpu.frontend.g2p.en_oov import Segmenter

    base = tmp_path / "g2p" / "en" / "wordsegment"
    base.mkdir(parents=True)
    (base / "unigrams.txt").write_text(
        "play\t500000000\nstation\t300000000\nplays\t80000000\n"
        "tation\t1000\nfire\t400000000\nground\t350000000\n"
        "the\t2000000000\nof\t1500000000\n")
    (base / "bigrams.txt").write_text("play station\t2000000\n")
    seg = Segmenter(models_dir=str(tmp_path))
    assert seg.segment("playstation") == ["play", "station"]
    assert seg.segment("fireground") == ["fire", "ground"]
    assert seg.segment("the") == ["the"]
    # lexicon DP fallback without corpus files
    seg2 = Segmenter(models_dir=None,
                     lexicon={"play": 1, "station": 1, "fire": 1, "ground": 1})
    assert seg2.segment("playstation") == ["play", "station"]
    assert seg2.segment("qqqq") == ["qqqq"]


def test_en_gru_lts_matches_reference_numpy(tmp_path):
    """The GRU OOV seq2seq must reproduce the reference numpy cell exactly
    (same checkpoint ⇒ same greedy phoneme sequence)."""
    models_dir = _make_en_models_dir(tmp_path)
    from gsv_tts_tpu.frontend.g2p.en_oov import load_gru_lts

    gru = load_gru_lts(str(models_dir))
    assert gru is not None

    saved = {k: sys.modules.get(k) for k in ("nltk", "nltk.tokenize")}
    nltk_stub = types.ModuleType("nltk")
    nltk_stub.pos_tag = lambda toks: [(t, "NN") for t in toks]
    tok_stub = types.ModuleType("nltk.tokenize")

    class _Tok:
        def tokenize(self, text):
            return text.split()

    tok_stub.TweetTokenizer = _Tok
    nltk_stub.tokenize = tok_stub
    for k in [k for k in sys.modules if k.startswith("refpkg.GPT_SoVITS.G2P.English")]:
        del sys.modules[k]
    sys.modules["nltk"] = nltk_stub
    sys.modules["nltk.tokenize"] = tok_stub
    try:
        gmod = import_reference_module("GPT_SoVITS/G2P/English/g2p_en.py",
                                       "GPT_SoVITS.G2P.English.g2p_en")
        # the reference G2p needs homographs.en + the npz in models_dir
        ref = gmod.G2p(str(models_dir), cmu={})
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in [k for k in sys.modules if k.startswith("refpkg.GPT_SoVITS.G2P.English")]:
            del sys.modules[k]

    for word in ("blorptastic", "quixotry", "vexnor", "hello", "xylophone",
                 "gsvttslite", "aaaa", "qwertyuiop"):
        assert gru.predict(word) == ref.predict(word), word


def test_auto_g2p_scoped_per_models_dir(tmp_path):
    """Auto-built G2P engines are keyed per models_dir (two TTS facades in
    one process never share a lexicon), while an explicitly injected engine
    still wins over models_dir routing (the oracle-test pattern)."""
    from gsv_tts_tpu.frontend.g2p import text_to_phonemes
    from gsv_tts_tpu.frontend.g2p.chinese import ChineseG2P

    def make_dir(name, tone):
        d = tmp_path / name / "g2p" / "zh"
        d.mkdir(parents=True)
        (d / "pinyin.txt").write_text(f"你\tni{tone}\n好\thao{tone}\n", "utf-8")
        return tmp_path / name

    dir_a, dir_b = make_dir("a", 3), make_dir("b", 2)
    old = global_config.chinese_g2p
    global_config.chinese_g2p = None
    try:
        ph_a, _, _ = text_to_phonemes("你好", "zh", models_dir=dir_a)
        ph_b, _, _ = text_to_phonemes("你好", "zh", models_dir=dir_b)
        assert ph_a != ph_b  # each models_dir sees its own lexicon
        # returning to dir_a reuses the cached engine (no rebuild churn)
        eng_a = global_config._g2p_auto["zh"][str(dir_a)]
        assert text_to_phonemes("你好", "zh", models_dir=dir_a)[0] == ph_a
        assert global_config._g2p_auto["zh"][str(dir_a)] is eng_a
        # a deliberately installed engine is honored, not silently replaced
        global_config.chinese_g2p = ChineseG2P(lexicon={"你": "ni4", "好": "hao4"})
        ph_inj, _, _ = text_to_phonemes("你好", "zh", models_dir=dir_a)
        assert ph_inj not in (ph_a, ph_b)
    finally:
        global_config.chinese_g2p = old


def test_g2p_build_does_not_pin_caller_stack():
    """Regression (r5 soak finding): building an EnglishG2P must not pin
    the caller's frame chain.  The nltk probes leak a frame on failure,
    and a leaked frame holds every ancestor frame via f_back — before the
    throwaway-thread fix, the first request that lazily built a G2P kept
    its whole TTS.infer stack (and one full stale model copy) alive."""
    import gc
    import weakref

    from gsv_tts_tpu.frontend.g2p.english import EnglishG2P

    class Sentinel:
        pass

    def build():
        sentinel = Sentinel()  # noqa: F841 — lives in this frame's locals
        EnglishG2P(None)
        return weakref.ref(sentinel)

    wr = build()
    gc.collect()
    assert wr() is None, "EnglishG2P construction pinned the caller frame"
