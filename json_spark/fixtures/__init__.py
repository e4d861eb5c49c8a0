from .signal import reference_signal, pcm16_wav_bytes, decode_wav_pcm16, clip_seed

__all__ = ["reference_signal", "pcm16_wav_bytes", "decode_wav_pcm16", "clip_seed"]
