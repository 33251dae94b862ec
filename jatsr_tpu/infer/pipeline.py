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

import functools
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


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _per_chunk_noise(key: jax.Array, n: int, frames: int,
                     channels: int) -> jax.Array:
    """[n, frames, channels] initial noise where slice i is a pure function
    of (key, i) — the per-chunk mapping that makes chunked sampling
    invariant to batching/grouping.  Unrolled (NOT vmapped) on purpose:
    under the rbg PRNG, vmapped normal() over folded keys collapses to a
    single-key draw; traced per-chunk calls keep distinct streams while
    still compiling to one device program."""
    return jnp.stack([
        jax.random.normal(jax.random.fold_in(key, i), (frames, channels),
                          jnp.float32)
        for i in range(n)
    ])


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


def crossfade_chunks_jnp(chunks, overlap_frames: int):
    """Device-resident :func:`crossfade_chunks` (same linear fades; jnp
    ops over static shapes, so the whole stitch stays on the chip)."""
    if not chunks:
        raise ValueError("no chunks")
    result = chunks[0]
    for cur in chunks[1:]:
        if overlap_frames > 0 and result.shape[0] >= overlap_frames:
            fade_out = jnp.linspace(1.0, 0.0, overlap_frames,
                                    dtype=jnp.float32)[:, None]
            fade_in = jnp.linspace(0.0, 1.0, overlap_frames,
                                   dtype=jnp.float32)[:, None]
            blended = (result[-overlap_frames:] * fade_out
                       + cur[:overlap_frames] * fade_in)
            result = jnp.concatenate(
                [result[:-overlap_frames], blended, cur[overlap_frames:]],
                axis=0,
            )
        else:
            result = jnp.concatenate([result, cur], axis=0)
    return result


def split_serve_devices(devices=None, n_decode: int = 1):
    """Partition devices into (sampler_devices, decode_devices) for the
    split multi-chip serving schedule: build the sampler mesh over the
    first group (``make_mesh(..., devices=sampler_devices)``) and hand the
    second to ``InferencePipeline(decode_devices=...)``.  With disjoint
    device sets the async runtime overlaps group *i*'s decodes with group
    *i+1*'s sampling (VERDICT r4 #5)."""
    devices = list(devices if devices is not None else jax.devices())
    if not 0 < n_decode < len(devices):
        raise ValueError(
            f"n_decode={n_decode} must leave >=1 sampler device of "
            f"{len(devices)}")
    return devices[:-n_decode], devices[-n_decode:]


class InferencePipeline:
    """LR latent / LR audio -> generated HR audio at 44.1 kHz."""

    # Class-level defaults so decode-only pipelines built without __init__
    # (tests construct via __new__ with just codec+hop) keep working.
    decode_devices = None
    _decode_rr = 0

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
        decode_devices=None,
    ):
        """``mesh``: optional (data, model) device mesh — chunk batches are
        sharded over ``data`` and params placed per the TP rules, so one
        sampler call data-parallelises across a v5e-8 style slice.

        ``decode_devices``: optional list of devices RESERVED for DAC
        decode (multi-chip serving scheduling, VERDICT r4 #5).  Decode
        segments are placed round-robin on these devices with per-device
        decoder-weight copies; because their device set is disjoint from
        the sampler mesh, the async XLA runtime executes group *i*'s
        decodes WHILE group *i+1* samples — per-chip throughput approaches
        min(sampler, decode) instead of the serial composition
        1/(1/sampler + 1/decode).  Pass a mesh built over the REMAINING
        devices (``split_serve_devices``).  Numerics are placement-
        invariant, so outputs are exactly the single-device results."""
        self.model = model
        self.norm = normalizer
        self.codec = codec
        self.cfg = sampler_cfg or SamplerConfig()
        self.sr = data_sample_rate
        self.hop = hop_length
        self.mesh = mesh
        self.decode_devices = list(decode_devices) if decode_devices else None
        self._decode_params_by_dev = {}
        self._decode_rr = 0
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
        return np.asarray(self.super_resolve_latent_device(
            lr_latent, key, num_steps, cfg_scale, max_batch))

    def super_resolve_latent_device(
        self,
        lr_latent: np.ndarray,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        max_batch: int = 0,
    ) -> jax.Array:
        """As :meth:`super_resolve_latent` but the whole chain — upload,
        normalize, chunk, sample, denormalize, crossfade — stays on
        device and the result is a device array.  One host->device
        transfer of the LR latent in, zero transfers out; feed the result
        straight to :meth:`decode_latent` for a device-resident
        latent->audio path.  (The original flow bounced the ~50 MB latent
        through the host between sampler and decode — 2 extra PCIe/tunnel
        hops.)"""
        key = jax.random.PRNGKey(0) if key is None else key
        T = lr_latent.shape[0]
        plan = chunk_plan(T, self.chunk_frames, self.overlap_frames)
        CF = self.chunk_frames

        # Normalize FIRST, then zero-pad the short tail chunk: zeros in
        # normalized space are exactly the trained CFG null token, whereas
        # zero-padding raw latents would normalize to (0-mean)/std — an
        # out-of-distribution condition the whole chunk attends to.
        lat_n = self.norm.norm_lr(jnp.asarray(lr_latent, jnp.float32)[None])[0]
        tail = plan[-1][1] - plan[-1][0]
        if tail < CF:  # pad so every static chunk slice is full-length
            lat_n = jnp.pad(lat_n, ((0, CF - tail), (0, 0)))
        cond = jnp.stack([lat_n[s: s + CF] for s, _ in plan])

        # Per-chunk noise (default): chunk i's initial noise is a pure
        # function of (key, i) — outputs are invariant to max_batch
        # grouping, mesh padding, and tail-group padding.  Matches the
        # reference's serial per-chunk torch.randn (infer_test_v3m2.py:
        # 370-398).  "batch" restores the rounds-1-4 whole-batch draw.
        # NOTE: traced as N separate normal() calls inside ONE jitted
        # program, NOT one vmapped draw — under the rbg PRNG (the TPU
        # serving default) vmapping normal() over folded keys collapses to
        # a single-key batch draw (all lanes share the first key), which
        # would silently break the per-chunk property.  Tracing them
        # unrolled keeps per-chunk bits AND one device dispatch (9 eager
        # draws through the tunnel cost real latency per call).
        z0_all = None
        if self.cfg.chunk_noise == "per_chunk":
            z0_all = _per_chunk_noise(key, len(plan), CF,
                                      int(lat_n.shape[-1]))

        groups = (
            [(0, len(plan))]
            if max_batch <= 0
            else [(i, min(i + max_batch, len(plan)))
                  for i in range(0, len(plan), max_batch)]
        )
        outs = []
        for gi, (s_g, e_g) in enumerate(groups):
            g = cond[s_g:e_g]
            z0 = None if z0_all is None else z0_all[s_g:e_g]
            n_real = g.shape[0]
            # Padded batch target.  With pad_tail_group the tail group is
            # padded with CFG-null chunks (zeros in normalized space) up
            # to the FULL group's size so it reuses that group's compiled
            # program — exact for the real chunks under per-chunk noise.
            # Under a mesh the target then rounds up to the data-axis
            # multiple (the same rounding every full group gets, so the
            # tail still compiles to the identical program shape).
            target = n_real
            if (self.cfg.pad_tail_group and z0 is not None and gi > 0
                    and n_real < max_batch):
                target = max_batch
            if self._batch_sharding is not None:
                target += (-target) % self._data_size
            pad_b = target - n_real
            if pad_b:
                g = jnp.concatenate(
                    [g, jnp.zeros((pad_b,) + g.shape[1:], g.dtype)], 0
                )
                if z0 is not None:
                    # padded rows still need well-formed noise; any values
                    # work (their outputs are sliced away).
                    z0 = jnp.concatenate(
                        [z0, jnp.zeros((pad_b,) + z0.shape[1:], z0.dtype)], 0)
            if self._batch_sharding is not None:
                g = jax.device_put(g, self._batch_sharding)
                if z0 is not None:
                    z0 = jax.device_put(z0, self._batch_sharding)
            gen = self.sampler(
                jax.random.fold_in(key, gi), g, num_steps, cfg_scale,
                z0=z0,
            )[:n_real]
            outs.append(self.norm.denorm_hr(gen))
        gen_all = jnp.concatenate(outs, axis=0)

        chunks = [gen_all[i, : e - s] for i, (s, e) in enumerate(plan)]
        out = crossfade_chunks_jnp(chunks, self.overlap_frames)
        return out[:T]

    def encode_lr_audio(self, audio: np.ndarray, sr: int) -> np.ndarray:
        """Mono audio at any rate -> LR latent [T, C] (resample to the codec
        rate, then encode)."""
        return np.asarray(self._encode_lr_audio_device(audio, sr))

    def _encode_lr_audio_device(self, audio, sr: int) -> jax.Array:
        assert self.codec is not None, "codec required for audio input"
        x = jnp.asarray(audio, jnp.float32).reshape(1, -1, 1)
        if sr != self.sr:
            x = resample(x, sr, self.sr)
        z, _ = self.codec.encode(x)
        return z[0]

    def super_resolve_audio(
        self,
        audio: np.ndarray,
        sr: int,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        max_batch: int = 8,
    ) -> np.ndarray:
        """Mono LR audio -> generated full-band audio at the codec rate.

        The whole chain (resample -> encode -> sample -> crossfade ->
        decode) is device-resident: audio uploads once, generated audio
        downloads once.  Sampling and decoding are INTERLEAVED per chunk
        group (:meth:`super_resolve_latent_to_audio`)."""
        assert self.codec is not None, "codec required for audio output"
        lr_latent = self._encode_lr_audio_device(audio, sr)
        return self.super_resolve_latent_to_audio(
            lr_latent, key, num_steps, cfg_scale, max_batch=max_batch)

    def _decode_call(self, batch) -> jax.Array:
        """[S, L, C] -> [S, L*hop, 1] decode, on the next round-robin
        decode device when ``decode_devices`` is set (the jitted decoder
        follows its committed inputs, so each device compiles once and
        disjoint-device programs run concurrently), else in place."""
        if self.decode_devices is None:
            return self.codec.decode(batch)
        dev = self.decode_devices[self._decode_rr % len(self.decode_devices)]
        self._decode_rr += 1
        if dev not in self._decode_params_by_dev:
            self._decode_params_by_dev[dev] = jax.device_put(
                self.codec._decode_params, dev)
        return self.codec._decode(self._decode_params_by_dev[dev],
                                  jax.device_put(batch, dev))

    @staticmethod
    def _decode_plan(T: int, segment_frames: int, ctx_frames: int):
        """[(s, e, lo, hi)] decode segments over a T-frame latent — the
        same windows :meth:`decode_latent` walks (final window anchored to
        end exactly at T so the right boundary is the decoder's true conv
        boundary)."""
        L = segment_frames + 2 * ctx_frames
        segs = []
        for s in range(0, T, segment_frames):
            e = min(T, s + segment_frames)
            lo = max(0, s - ctx_frames)
            hi = min(T, e + ctx_frames)
            if hi == T:
                lo = max(0, T - L)
            segs.append((s, e, lo, hi))
        return segs

    def super_resolve_latent_to_audio(
        self,
        lr_latent: np.ndarray,
        key: Optional[jax.Array] = None,
        num_steps: Optional[int] = None,
        cfg_scale: Optional[float] = None,
        max_batch: int = 8,
        segment_frames: int = 2756,
        ctx_frames: int = 64,
    ) -> np.ndarray:
        """[T, C] LR latent -> mono audio with sampling and decoding
        INTERLEAVED (VERDICT r3 #1b): chunk-group *i*'s finalized decode
        segments are enqueued before group *i+1*'s sampler call, so on a
        multi-program backend (or while the host is busy) decode work
        overlaps the next group's sampling instead of all decodes trailing
        the full sampler pass.  Numerically identical to
        ``decode_latent(super_resolve_latent_device(...))`` — the
        incremental crossfade performs the same arithmetic as
        :func:`crossfade_chunks_jnp` and the decode windows are the same
        (``_decode_plan``).  Ref: infer_test_v3m2.py:370-442 runs the two
        phases strictly serially."""
        assert self.codec is not None, "codec required for audio output"
        key = jax.random.PRNGKey(0) if key is None else key
        T = lr_latent.shape[0]
        CF, OV, hop = self.chunk_frames, self.overlap_frames, self.hop
        plan = chunk_plan(T, CF, OV)

        # Short input: single chunk, single decode — nothing to interleave.
        if T <= segment_frames + 2 * ctx_frames or len(plan) < 2:
            gen = self.super_resolve_latent_device(
                lr_latent, key, num_steps, cfg_scale, max_batch)
            return self.decode_latent(gen, segment_frames, ctx_frames)

        # Normalize + pad exactly as super_resolve_latent_device.
        lat_n = self.norm.norm_lr(
            jnp.asarray(lr_latent, jnp.float32)[None])[0]
        tail = plan[-1][1] - plan[-1][0]
        if tail < CF:
            lat_n = jnp.pad(lat_n, ((0, CF - tail), (0, 0)))
        cond = jnp.stack([lat_n[s: s + CF] for s, _ in plan])

        segs = self._decode_plan(T, segment_frames, ctx_frames)
        L = segment_frames + 2 * ctx_frames
        fade_out = jnp.linspace(1.0, 0.0, OV, dtype=jnp.float32)[:, None]
        fade_in = jnp.linspace(0.0, 1.0, OV, dtype=jnp.float32)[:, None]

        mb = max_batch if max_batch > 0 else len(plan)
        groups = [(gi, cond[i: i + mb], plan[i: i + mb])
                  for gi, i in enumerate(range(0, len(plan), mb))]

        stitched = None   # device array of frames [0, done) — final values
        pending = None    # trailing OV frames still subject to the next blend
        wav_pieces = []
        next_seg = 0
        ci = 0  # global chunk index
        for gi, g, gplan in groups:
            n_real = g.shape[0]
            if self._batch_sharding is not None:
                pad_b = (-n_real) % self._data_size
                if pad_b:
                    g = jnp.concatenate(
                        [g, jnp.zeros((pad_b,) + g.shape[1:], g.dtype)], 0)
                g = jax.device_put(g, self._batch_sharding)
            gen = self.sampler(
                jax.random.fold_in(key, gi), g, num_steps, cfg_scale
            )[:n_real]
            gen = self.norm.denorm_hr(gen)

            for j, (s, e) in enumerate(gplan):
                cur = gen[j, : e - s]
                if stitched is None:
                    stitched, pending = cur[:-OV], cur[-OV:]
                else:
                    blended = pending * fade_out + cur[:OV] * fade_in
                    body = jnp.concatenate([blended, cur[OV:]], axis=0)
                    if ci == len(plan) - 1:
                        stitched = jnp.concatenate([stitched, body], axis=0)
                        pending = None
                    else:
                        stitched = jnp.concatenate(
                            [stitched, body[:-OV]], axis=0)
                        pending = body[-OV:]
                ci += 1
            done = stitched.shape[0]

            # Enqueue every decode segment now fully final.  The device
            # executes these while the HOST builds (and under a tunnelled
            # backend, uploads) the next group's work.
            while next_seg < len(segs) and segs[next_seg][3] <= done:
                s, e, lo, hi = segs[next_seg]
                seg = stitched[lo:hi]
                pad = L - (hi - lo)
                if pad:
                    seg = jnp.pad(seg, ((0, pad), (0, 0)))
                wav = self._decode_call(seg[None])[0, :, 0]
                wav_pieces.append(
                    wav[(s - lo) * hop: (s - lo + e - s) * hop])
                next_seg += 1

        assert pending is None and stitched.shape[0] == T
        assert next_seg == len(segs)
        return np.concatenate([np.asarray(p) for p in wav_pieces])

    def decode_latent(self, latent, segment_frames: int = 2756,
                      ctx_frames: int = 64,
                      decode_batch: int = 1) -> np.ndarray:
        """[T, C] latent (host or DEVICE array — pass the result of
        ``super_resolve_latent_device`` to skip two transfers) -> mono
        audio.

        Long latents decode in ``segment_frames`` segments (default 32 s)
        with ``ctx_frames`` of context either side (far beyond the
        decoder's receptive field, so the trimmed seams are exact) — a
        whole-song decode materialises multi-GB conv intermediates and
        OOMs a 16 GB chip around the ~2 min mark.  Segments share one
        padded shape, so the decoder compiles once.  The FINAL segment is
        anchored so its window ENDS exactly at the song end: its right
        boundary is then the decoder's true conv-padding boundary, exactly
        as in an unsegmented decode (trailing zero-LATENT padding is not
        equivalent to per-layer conv boundary padding — ADVICE r2 #2)."""
        # keep pieces on device: dispatch is async, so every segment's
        # decode enqueues immediately and the host fetches below overlap
        # the remaining compute (a per-piece np.asarray inside the loop
        # serialised decode and transfer: 45 -> 70 audio-sec/s).
        pieces = self.decode_latent_pieces(latent, segment_frames,
                                           ctx_frames, decode_batch)
        return np.concatenate([np.asarray(p) for p in pieces])

    def decode_latent_pieces(self, latent, segment_frames: int = 2756,
                             ctx_frames: int = 64,
                             decode_batch: int = 1) -> List[jax.Array]:
        """:meth:`decode_latent` minus the host fetch: the ordered list of
        DEVICE wav pieces (concatenated they are the full song).  Callers
        that only need a completion barrier (benches) fetch scalars.

        ``decode_batch``: segments decoded per decoder call.  >1 amortises
        the per-call fixed costs (grid setup, the unfused conv stages'
        launch overhead) across segments — the batched call is one
        [S, L, C] decode, identical math per segment (VERDICT r4 #4).
        Short groups pad to the full batch so the decoder compiles once."""
        assert self.codec is not None
        z = jnp.asarray(latent)
        T = z.shape[0]
        hop = self.hop
        if segment_frames <= 0 or T <= segment_frames + 2 * ctx_frames:
            return [self._decode_call(z[None])[0, :, 0]]

        L = segment_frames + 2 * ctx_frames  # fixed compile shape
        plan = self._decode_plan(T, segment_frames, ctx_frames)
        segs = []
        for s, e, lo, hi in plan:
            seg = z[lo:hi]
            pad = L - (hi - lo)
            if pad:
                seg = jnp.pad(seg, ((0, pad), (0, 0)))
            segs.append(seg)
        nb = max(1, decode_batch)
        pieces = []
        for i in range(0, len(segs), nb):
            group = segs[i: i + nb]
            n_real = len(group)
            batch = jnp.stack(group)
            if n_real < nb:  # pad so every call shares one compiled shape
                batch = jnp.pad(batch,
                                ((0, nb - n_real), (0, 0), (0, 0)))
            wavs = self._decode_call(batch)
            for j in range(n_real):
                s, e, lo, hi = plan[i + j]
                pieces.append(
                    wavs[j, (s - lo) * hop: (s - lo + e - s) * hop, 0])
        return pieces
