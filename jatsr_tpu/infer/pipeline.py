"""Chunked long-audio inference with crossfade stitching.

Reference behaviour (infer_test_v3m2.py:339-406): fixed 16 s chunks
(1378 frames, training-aligned), 2 s overlap, per-chunk normalize → 50-step
CFG flow sampling → denormalize, then linear crossfade.

TPU-first difference: the reference loops chunks serially through the
sampler (one Python ODE loop per chunk, 2x model calls per step under CFG);
here **all chunks are batched through one jitted sampler call** — the ODE
runs once over a [N_chunks, 1378, 1024] batch, which is the main
throughput lever toward the >=5x-real-time target (SURVEY.md §7 step 8).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import SamplerConfig
from ..models.dac import DAC
from ..ops import resample
from ..sampling import FlowSampler
from ..train.step import Normalizer


def chunk_plan(total_frames: int, chunk_frames: int,
               overlap_frames: int) -> List[Tuple[int, int]]:
    """[(start, end)] covering ``total_frames`` (infer_test_v3m2.py:359-362)."""
    if total_frames <= chunk_frames:
        return [(0, total_frames)]
    stride = chunk_frames - overlap_frames
    n = (total_frames - overlap_frames + stride - 1) // stride
    return [
        (i * stride, min(i * stride + chunk_frames, total_frames))
        for i in range(n)
    ]


def crossfade_chunks(chunks: List[np.ndarray],
                     overlap_frames: int) -> np.ndarray:
    """Linear fade-out/fade-in stitch of [T_i, C] chunks
    (infer_test_v3m2.py:188-233)."""
    if not chunks:
        raise ValueError("no chunks")
    result = chunks[0]
    for cur in chunks[1:]:
        if overlap_frames > 0 and result.shape[0] >= overlap_frames:
            fade_out = np.linspace(1.0, 0.0, overlap_frames,
                                   dtype=np.float32)[:, None]
            fade_in = np.linspace(0.0, 1.0, overlap_frames,
                                  dtype=np.float32)[:, None]
            blended = (result[-overlap_frames:] * fade_out
                       + cur[:overlap_frames] * fade_in)
            result = np.concatenate(
                [result[:-overlap_frames], blended, cur[overlap_frames:]],
                axis=0,
            )
        else:
            result = np.concatenate([result, cur], axis=0)
    return result


class InferencePipeline:
    """LR latent / LR audio -> generated HR audio at 44.1 kHz."""

    def __init__(
        self,
        model,
        params,
        normalizer: Normalizer,
        codec: Optional[DAC] = None,
        sampler_cfg: Optional[SamplerConfig] = None,
        data_sample_rate: int = 44100,
        hop_length: int = 512,
        mesh=None,
    ):
        """``mesh``: optional (data, model) device mesh — chunk batches are
        sharded over ``data`` and params placed per the TP rules, so one
        sampler call data-parallelises across a v5e-8 style slice."""
        self.model = model
        self.norm = normalizer
        self.codec = codec
        self.cfg = sampler_cfg or SamplerConfig()
        self.sr = data_sample_rate
        self.hop = hop_length
        self.mesh = mesh
        if mesh is not None:
            from ..parallel import batch_sharding, param_shardings

            params = jax.device_put(params, param_shardings(mesh, params))
            self._batch_sharding = batch_sharding(mesh)
            self._data_size = mesh.shape["data"]
        else:
            self._batch_sharding = None
            self._data_size = 1
        self.params = params
        # params flow through the jit boundary as arguments — closing over
        # them would serialise 766 M weights into the compiled HLO.
        # adaln_fn: every step's AdaLN modulations are precomputed outside
        # the ODE loop (models.dit.adaln_tables — the adaln stack is 36% of
        # the params and depends only on t).
        from ..models.dit import adaln_tables

        mcfg = model.cfg
        self.sampler = FlowSampler(
            lambda p, z, t, c, mod=None: model.apply(
                {"params": p}, z, t, c, adaln_mod=mod),
            self.cfg,
            params=self.params,
            adaln_fn=lambda p, tv: adaln_tables(mcfg, p, tv),
        )

    @property
    def chunk_frames(self) -> int:
        return int(self.cfg.chunk_duration * self.sr / self.hop)  # 1378

    @property
    def overlap_frames(self) -> int:
        return int(self.cfg.overlap_duration * self.sr / self.hop)  # 172

    def super_resolve_latent(
        self,
        lr_latent: np.ndarray,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        max_batch: int = 0,
    ) -> np.ndarray:
        """[T, C] raw LR latent -> [T, C] generated raw HR latent.

        All chunks are padded to ``chunk_frames`` and sampled in one batched
        jitted call (optionally split into ``max_batch``-sized groups).
        """
        key = jax.random.PRNGKey(0) if key is None else key
        T = lr_latent.shape[0]
        plan = chunk_plan(T, self.chunk_frames, self.overlap_frames)
        CF = self.chunk_frames

        # Normalize FIRST, then zero-pad the short tail chunk: zeros in
        # normalized space are exactly the trained CFG null token, whereas
        # zero-padding raw latents would normalize to (0-mean)/std — an
        # out-of-distribution condition the whole chunk attends to.
        lat_n = np.asarray(self.norm.norm_lr(lr_latent[None]))[0]
        batch = np.zeros((len(plan), CF, lr_latent.shape[1]), np.float32)
        for i, (s, e) in enumerate(plan):
            batch[i, : e - s] = lat_n[s:e]
        cond = jnp.asarray(batch)

        groups = (
            [cond]
            if max_batch <= 0
            else [cond[i : i + max_batch] for i in range(0, len(plan), max_batch)]
        )
        outs = []
        for gi, g in enumerate(groups):
            n_real = g.shape[0]
            if self._batch_sharding is not None:
                pad_b = (-n_real) % self._data_size
                if pad_b:
                    g = jnp.concatenate(
                        [g, jnp.zeros((pad_b,) + g.shape[1:], g.dtype)], 0
                    )
                g = jax.device_put(g, self._batch_sharding)
            gen = self.sampler(
                jax.random.fold_in(key, gi), g, num_steps, cfg_scale
            )[:n_real]
            outs.append(np.asarray(self.norm.denorm_hr(gen)))
        gen_all = np.concatenate(outs, axis=0)

        chunks = [gen_all[i, : e - s] for i, (s, e) in enumerate(plan)]
        out = crossfade_chunks(chunks, self.overlap_frames)
        return out[:T]

    def encode_lr_audio(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """Mono audio at any rate -> LR latent [T, C] (resample to the codec
        rate, then encode)."""
        assert self.codec is not None, "codec required for audio input"
        x = jnp.asarray(audio, jnp.float32).reshape(1, -1, 1)
        if sr != self.sr:
            x = resample(x, sr, self.sr)
        z, _ = self.codec.encode(x)
        return np.asarray(z[0])

    def super_resolve_audio(
        self,
        audio: np.ndarray,
        sr: int,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
    ) -> np.ndarray:
        """Mono LR audio -> generated full-band audio at the codec rate."""
        assert self.codec is not None, "codec required for audio output"
        lr_latent = self.encode_lr_audio(audio, sr)
        gen = self.super_resolve_latent(lr_latent, key, num_steps, cfg_scale)
        wav = self.codec.decode(jnp.asarray(gen[None]))
        return np.asarray(wav)[0, :, 0]

    def decode_latent(self, latent: np.ndarray) -> np.ndarray:
        assert self.codec is not None
        return np.asarray(self.codec.decode(jnp.asarray(latent[None])))[0, :, 0]
