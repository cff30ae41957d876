"""Basic usage examples (reference README snippets, adapted).

Requires real checkpoints in the models dir (downloaded automatically on
first run when the network is available, or place them manually):
  s1v3.ckpt, s2Gv2ProPlus.pth, chinese-hubert-base/, sv/, g2p/
"""
from gsv_tts_tpu import TTS, cut_text

tts = TTS()
tts.load_gpt_model()      # defaults to models_dir/s1v3.ckpt
tts.load_sovits_model()   # defaults to models_dir/s2Gv2ProPlus.pth

SPK = "examples/speaker.wav"
PROMPT = "examples/prompt.wav"
PROMPT_TEXT = "这是参考音频的文本。"

# -- single utterance with subtitles ---------------------------------------
clip = tts.infer(SPK, PROMPT, PROMPT_TEXT, "你好，世界！今天天气真不错。",
                 return_subtitles=True)
clip.save("out.wav", is_save_subtitles=True)
clip.play()
tts.audio_queue.wait()

# -- streaming --------------------------------------------------------------
for chunk in tts.infer_stream(SPK, PROMPT, PROMPT_TEXT,
                              "流式合成的第一句。然后是第二句，会按标点切分。"):
    chunk.play()
tts.audio_queue.wait()

# -- batched throughput mode ------------------------------------------------
clips = tts.infer_batched(SPK, PROMPT, PROMPT_TEXT,
                          ["第一段文本。", "第二段文本稍微长一点。", "第三段。"])
for i, c in enumerate(clips):
    c.save(f"batch_{i}.wav")

# -- voice conversion + speaker verification -------------------------------
vc_clip = tts.infer_vc(SPK, PROMPT, PROMPT_TEXT)
vc_clip.save("vc.wav")
print("speaker similarity:", tts.verify_speaker(SPK, PROMPT))

# -- multi-speaker fusion ---------------------------------------------------
fused = tts.infer({SPK: 0.7, PROMPT: 0.3}, PROMPT, PROMPT_TEXT, "混合音色示例。")
fused.save("fused.wav")
