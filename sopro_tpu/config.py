"""Model hyper-parameter configuration.

Field set and defaults match the reference checkpoint contract
(reference: src/sopro/config.py:7-43) so that a `cfg` JSON embedded in a
sopro `model.safetensors` metadata block deserializes unchanged.

TPU-specific knobs (compute dtype, bucketing) live in `RuntimeConfig` so the
checkpoint-facing dataclass stays exactly the reference field set.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

from sopro_tpu.constants import TARGET_SR


@dataclass(frozen=True)
class SoproTTSConfig:
    num_codebooks: int = 32
    codebook_size: int = 2048
    mimi_fps: float = 12.5
    max_frames: int = 400
    audio_sr: int = TARGET_SR

    d_model: int = 384
    n_layers_text: int = 2
    dropout: float = 0.05
    pos_emb_max: int = 4096
    max_text_len: int = 2048

    n_layers_ar: int = 6
    ar_kernel: int = 13
    ar_dilation_cycle: Tuple[int, ...] = (1, 2, 4, 1)
    ar_text_attn_freq: int = 2
    min_gen_frames: int = 12

    n_layers_nar: int = 6
    nar_head_dim: int = 256
    nar_kernel_size: int = 11
    nar_dilation_cycle: Tuple[int, ...] = (1, 2, 4, 8)

    stage_B: Tuple[int, int] = (2, 4)
    stage_C: Tuple[int, int] = (5, 8)
    stage_D: Tuple[int, int] = (9, 16)
    stage_E: Tuple[int, int] = (17, 32)

    sv_student_dim: int = 192
    style_strength: float = 1.0

    ref_enc_layers: int = 2
    ref_xattn_heads: int = 2
    ref_xattn_layers: int = 3
    ref_xattn_gmax: float = 0.35

    # ---- derived quantities --------------------------------------------

    @property
    def eos_id(self) -> int:
        # AR vocab is codebook_size + 1; the extra row is EOS
        # (reference: src/sopro/model.py:59,83).
        return int(self.codebook_size)

    @property
    def ar_vocab(self) -> int:
        return int(self.codebook_size) + 1

    def ar_dilations(self) -> Tuple[int, ...]:
        """Per-layer AR dilations, cycle repeated to n_layers_ar
        (reference: src/sopro/nn/generator.py:16-20)."""
        return _cycle_to(self.ar_dilation_cycle, self.n_layers_ar)

    def nar_dilations(self) -> Tuple[int, ...]:
        """Per-layer NAR dilations (reference: src/sopro/nn/nar.py:48-52)."""
        cycle = tuple(int(x) for x in self.nar_dilation_cycle) or (1,)
        return _cycle_to(cycle, self.n_layers_nar)

    def rf_ar(self) -> int:
        """AR receptive field in frames (reference: src/sopro/sampling.py:96-97)."""
        return 1 + (int(self.ar_kernel) - 1) * int(sum(self.ar_dilations()))

    def rf_nar(self) -> int:
        """NAR receptive field in frames (reference: src/sopro/sampling.py:100-101)."""
        return 1 + (int(self.nar_kernel_size) - 1) * int(sum(self.nar_dilations()))

    def stage_indices(self) -> Dict[str, List[int]]:
        """0-based codebook indices per NAR stage
        (reference: src/sopro/model.py:39-42,85-91)."""
        q = int(self.num_codebooks)
        out: Dict[str, List[int]] = {}
        for name, rng in (
            ("B", self.stage_B),
            ("C", self.stage_C),
            ("D", self.stage_D),
            ("E", self.stage_E),
        ):
            lo, hi = int(rng[0]), int(rng[1])
            out[name] = [i for i in range(lo - 1, hi) if 1 <= i < q]
        return out

    def stage_order(self) -> List[str]:
        idx = self.stage_indices()
        return [s for s in ("B", "C", "D", "E") if len(idx[s]) > 0]

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "SoproTTSConfig":
        """Build from a checkpoint cfg dict, dropping unknown keys
        (reference: src/sopro/hub.py:44-48)."""
        names = {f.name for f in dataclasses.fields(cls)}
        init = {}
        for k, v in d.items():
            if k not in names:
                continue
            if isinstance(v, list):
                v = tuple(v)
            init[k] = v
        return cls(**init)

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return {k: (list(v) if isinstance(v, tuple) else v) for k, v in d.items()}


def _cycle_to(cycle: Tuple[int, ...], n: int) -> Tuple[int, ...]:
    out: List[int] = []
    while len(out) < int(n):
        out.extend(int(x) for x in cycle)
    return tuple(out[: int(n)])


@dataclass(frozen=True)
class RuntimeConfig:
    """TPU execution knobs; not part of the checkpoint contract."""

    # Compute dtype for the matmul-heavy paths. Norms, attention softmax and
    # sampling always run in float32 (matching the reference's fp32 islands).
    compute_dtype: str = "float32"
    param_dtype: str = "float32"
    # Pad text-token sequences to these bucket lengths to bound recompiles.
    text_buckets: Tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024, 2048)
    # Pad reference-token sequences (frames) to these buckets.
    ref_buckets: Tuple[int, ...] = (32, 64, 96, 128, 160, 256)
    # Pad NAR sequence length to a multiple of this.
    nar_pad_multiple: int = 64
    # AR scan chunk size for streaming-mode decode.
    ar_chunk: int = 8
    # synthesize_batch sub-batch size: groups pipeline so one group's
    # device->host waveform transfer can overlap the next group's compute.
    # 0 (default) = single fused batch: on the remote-tunnel device,
    # transfers serialize with compute and per-group AR weight re-reads cost
    # more than the overlap buys (measured 479x -> 223x going 32 -> 8-row
    # groups); set >0 on locally-attached hardware or when a huge batch
    # would not fit HBM.
    batch_pipeline_group: int = 0
    # Fused Pallas kernel for the AR decode step. None (default) = auto:
    # ON for TPU backends (measured 55 vs 84 us/step incl. sampling vs the
    # XLA step at batch 1 — the kernel streams each block's weight slab
    # HBM->VMEM through the Pallas pipeline), OFF elsewhere (interpret mode
    # is for tests only).
    use_pallas_ar: "bool | None" = None
    # Whole-loop resident Pallas AR decode: ALL max_frames+1 steps (block
    # stack + sampler + anti-loop bookkeeping) run inside ONE pallas_call
    # with every weight slab resident in VMEM for the whole loop (~24 MB
    # bf16 at text bucket 256; the kernel raises the scoped-VMEM limit past
    # XLA's 16 MB default — v5e accepts it). Removes the per-step
    # kernel-launch + XLA-glue cost that dominates the per-step paths:
    # measured 18.5 vs 70 us/step on v5e (7.4 ms for a 401-step decode).
    # None (default) = auto: ON for TPU when the single-stream
    # full-generate path qualifies (B == 1, text bucket <= 512), OFF
    # elsewhere. Independent of use_pallas_ar: resident full-generate calls
    # take the whole-loop kernel even when the per-step kernel is off.
    use_pallas_resident: "bool | None" = None
    # Fused Pallas SEANet vocoder: the whole decoder conv stack (k7 conv,
    # 4 polyphase-transpose upsample stages + residual blocks, final k3)
    # runs as ONE time-tiled kernel with VMEM-resident weights; activations
    # never round-trip HBM. Measured 3.24 vs 14.93 ms on-chip for 32 s of
    # audio on v5e-1 (the XLA path re-materializes up-to-[770k, 64]
    # activations per stage). None (default) = auto: ON for TPU on the
    # single-row decode paths when the codec config fits the kernel's
    # 128-lane layout (production Mimi does), OFF elsewhere.
    use_pallas_vocoder: "bool | None" = None


def pick_bucket(n: int, buckets: Tuple[int, ...]) -> int:
    for b in buckets:
        if n <= b:
            return int(b)
    # beyond the largest bucket: round up to a multiple of it
    top = int(buckets[-1])
    return ((int(n) + top - 1) // top) * top
