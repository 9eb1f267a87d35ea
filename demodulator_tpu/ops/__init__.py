"""TPU op library: conditioning, discriminator, filter extraction/apply,
polyphase resampling, and the fused Pallas kernels."""
from .conditioning import shift_origin, normalize_input, correct_iq
from .demod import fm_demod, atan2_fast
from .fir_apply import JRealFir, JCplxFir
from .resample import PolyResampler, design_resampler_taps, kaiser_lowpass

__all__ = [
    "shift_origin", "normalize_input", "correct_iq",
    "fm_demod", "atan2_fast",
    "JRealFir", "JCplxFir",
    "PolyResampler", "design_resampler_taps", "kaiser_lowpass",
]
