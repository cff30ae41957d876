"""Sync-vs-batched wall-clock benchmark (methodology of the reference
``API/test_async_performance.py``): synthesize N texts one-by-one through the
async single path, then once through the batched path, and compare."""
import argparse
import asyncio
import time

from gsv_tts_tpu import TTS

TEXTS = [
    "今天的天气真不错，适合出去走一走。",
    "人工智能正在改变我们的生活方式。",
    "这是第三段测试文本，长度适中。",
    "流式语音合成对延迟的要求非常高。",
    "批处理模式可以显著提升吞吐量。",
    "感谢你使用这个语音合成引擎。",
]


async def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spk", required=True)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--prompt-text", required=True)
    ap.add_argument("--gpt", default=None)
    ap.add_argument("--sovits", default=None)
    ap.add_argument("--models-dir", default=None)
    args = ap.parse_args()

    tts = TTS(models_dir=args.models_dir)
    tts.load_gpt_model(*([args.gpt] if args.gpt else []))
    tts.load_sovits_model(*([args.sovits] if args.sovits else []))

    # warmup (compile)
    await tts.infer_async(args.spk, args.prompt, args.prompt_text, TEXTS[0])

    t0 = time.perf_counter()
    sync_clips = []
    for text in TEXTS:
        sync_clips.append(await tts.infer_async(
            args.spk, args.prompt, args.prompt_text, text))
    sync_s = time.perf_counter() - t0
    sync_audio = sum(c.audio_len_s for c in sync_clips)

    t0 = time.perf_counter()
    batch_clips = await tts.infer_batched_async(
        args.spk, args.prompt, args.prompt_text, TEXTS)
    batch_s = time.perf_counter() - t0
    batch_audio = sum(c.audio_len_s for c in batch_clips)

    print(f"sequential: {sync_s:.2f}s wall for {sync_audio:.2f}s audio "
          f"(RTF {sync_s / sync_audio:.3f})")
    print(f"batched:    {batch_s:.2f}s wall for {batch_audio:.2f}s audio "
          f"(RTF {batch_s / batch_audio:.3f})")
    print(f"speedup:    {sync_s / batch_s:.2f}x")


if __name__ == "__main__":
    asyncio.run(main())
