"""Frontend tests: symbols, language segmentation, cut_text, G2P invariants,
normalizers, and subtitle-index parity vs the reference algorithms."""
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
    assert "".join(s["text"] for s in segs) == "你好hello世界こんにちは"
    assert langs[0] == "zh" and "en" in langs and "ja" in langs


def test_lang_segment_tags():
    segs = LangSegment.getTexts("<ja>雨</ja>と<zh>雨</zh>")
    assert segs[0]["lang"] == "ja" and segs[0]["text"].startswith("雨")
    assert segs[-1]["lang"] == "zh" and segs[-1]["text"] == "雨"


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
