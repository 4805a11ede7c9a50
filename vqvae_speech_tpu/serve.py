"""Production batch-encode serving: static-shape buckets under one jit each.

The reference has no serving story (its encode path is the per-utterance
torch pipeline in src/main.py + src/dataset/*); on TPU the constraint that
shapes be static under ``jax.jit`` is the central serving problem — naive
per-request shapes would recompile constantly.  This module solves it the
TPU-native way:

* requests are grouped into a small set of **wave-length buckets**; each
  bucket compiles exactly one XLA program (lazily, then cached),
* within a bucket, waves are zero-padded to the bucket length and batches to
  a fixed ``max_batch`` — every launch has identical shapes,
* items are encoded under ``jax.vmap`` of a batch-1 encode, NOT one big
  batch-B encode.  This matters because of the reference's (C, T, B)-order
  VQ flatten (src/models/vector_quantizer.py:88-93, reproduced in
  ops/vq.py:reference_flatten): at B > 1 a flattened row interleaves
  elements from DIFFERENT batch items, so codes would depend on what else
  shared the launch.  vmap keeps every item on the reference's batch-1
  semantics (what its own validation/eval stream uses) while still running
  one fused device program per launch.

Exactness contract (tests/test_serve.py): for every request, the returned
codes are bit-identical to a standalone batch-1 ``conv_vqvae_encode`` of the
same wave zero-padded to the bucket length — zero-padding to a fixed length
is the reference pipeline's own utterance contract
(src/dataset/vctk_dataset.py pad/crop, reproduced in
data/audio.py:pad_or_random_crop).  Note the reference flatten makes each
code row a function of whole latent channels (all timesteps), so codes of a
padded wave are NOT a prefix of the unpadded wave's codes — callers wanting
pad-independent codes must send exact bucket-length utterances, as the
training pipeline's fixed crops already do.
"""
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import numpy as np

from vqvae_speech_tpu.ops.dsp import num_frames


@dataclass
class EncodeResult:
    """codes: (T_lat,) int32 VQ indices of the zero-padded wave (reference
    .view(B, -1) stream order); n_frames: feature frames of the TRUE wave;
    bucket: the padded wave length actually encoded."""
    codes: np.ndarray
    n_frames: int
    bucket: int


class BucketedEncodeServer:
    """Batch wav -> VQ-code serving over a trained ConvolutionalVQVAE.

    Parameters
    ----------
    params, state, config : the trained model triple (see
        train/checkpoint.py:load_checkpoint).
    wave_buckets : ascending wave lengths (samples); each compiles one
        program.  Requests longer than the largest bucket are rejected.
    max_batch : device batch per launch (static).
    normalizer : optional {"train_mean", "train_std"} feature normalizer
        (the export pipeline's contract, data/feature_store.py).

    Measured on v5e with the flagship model (max_batch 32): ~80 s one-time
    compile per bucket, then ~150 ms for 50 mixed-length utterances
    (dispatch-latency-bound through this image's remote-TPU tunnel).
    """

    def __init__(self, params, state, config: dict, *,
                 wave_buckets: Sequence[int] = (7680, 15360, 30720),
                 max_batch: int = 64,
                 normalizer: Optional[dict] = None,
                 use_pallas: Optional[bool] = None):
        self._params = params
        self._state = state
        self._config = dict(config)
        self._buckets = tuple(sorted(int(b) for b in wave_buckets))
        self._max_batch = int(max_batch)
        self._normalizer = normalizer
        self._use_pallas = use_pallas
        self._compiled: Dict[int, object] = {}
        self._launches = 0

    # -------------------- internals --------------------

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        raise ValueError(
            f"wave of {n} samples exceeds the largest bucket "
            f"{self._buckets[-1]}; add a bucket or chunk the input")

    def _build(self, bucket: int):
        """One jitted program: (max_batch, bucket) waves -> (max_batch,
        T_lat) code indices, each row on batch-1 reference semantics."""
        import jax
        import jax.numpy as jnp

        from vqvae_speech_tpu.ops import speech_features
        from vqvae_speech_tpu.models import conv_vqvae_encode

        cfg = self._config
        mean = std = None
        if self._normalizer is not None:
            mean = jnp.asarray(self._normalizer["train_mean"], jnp.float32)
            std = jnp.asarray(self._normalizer["train_std"], jnp.float32)

        def encode_one(wave):                      # (bucket,) -> (T_lat,)
            feats = speech_features(
                cfg.get("input_features_type", "mfcc"), wave[None],
                cfg.get("sampling_rate", 16000),
                cfg["input_features_filters"],
                cfg.get("augment_input_features", True),
            ).astype(jnp.float32)
            if mean is not None:
                feats = (feats - mean) / std
            out = conv_vqvae_encode(self._params, self._state, feats, cfg,
                                    training=False,
                                    use_pallas=self._use_pallas)
            # reference alignment_stats.py:302 stream order at B=1
            return out.indices.reshape(-1).astype(jnp.int32)

        return jax.jit(jax.vmap(encode_one))

    def _frames(self, n_samples: int) -> int:
        cfg = self._config
        rate = cfg.get("sampling_rate", 16000)
        return num_frames(n_samples, int(0.025 * rate), int(0.010 * rate))

    # -------------------- API --------------------

    def encode(self, waves: Sequence[np.ndarray]) -> List[EncodeResult]:
        """Encode a heterogeneous batch of float waves (any lengths that fit
        the buckets).  Returns one EncodeResult per input, in order."""
        order: Dict[int, List[int]] = {}
        for i, w in enumerate(waves):
            order.setdefault(self._bucket_for(len(w)), []).append(i)

        results: List[Optional[EncodeResult]] = [None] * len(waves)
        for bucket, idxs in sorted(order.items()):
            fn = self._compiled.get(bucket)
            if fn is None:
                fn = self._compiled[bucket] = self._build(bucket)
            for at in range(0, len(idxs), self._max_batch):
                chunk = idxs[at:at + self._max_batch]
                batch = np.zeros((self._max_batch, bucket), np.float32)
                for row, i in enumerate(chunk):
                    w = np.asarray(waves[i], np.float32)
                    batch[row, :len(w)] = w
                codes = np.asarray(fn(batch))      # (max_batch, T_lat)
                self._launches += 1
                for row, i in enumerate(chunk):
                    results[i] = EncodeResult(
                        codes=codes[row],
                        n_frames=self._frames(len(waves[i])),
                        bucket=bucket)
        return results  # type: ignore[return-value]

    @property
    def stats(self) -> dict:
        return {"compiled_buckets": sorted(self._compiled),
                "launches": self._launches,
                "max_batch": self._max_batch}


@dataclass
class SynthesisResult:
    """wave: (n_samples,) synthesized audio (int mu-law bins or float,
    per config), trimmed to the request's true conditioning length."""
    wave: np.ndarray
    bucket: int


class BucketedSynthesisServer:
    """Batch vocoder synthesis: local-conditioning buckets + padded batches.

    Same static-shape discipline as BucketedEncodeServer, applied to the
    scan-based AR decode (models/wavenet/incremental.py).  Unlike the VQ
    flatten, WaveNet rows are batch-independent and generation is causal,
    so padded batch rows are exact and tail padding only perturbs samples
    within the conditioning upsampler's receptive field of the true end —
    tests assert bit-parity of greedy decode between padded-batched and
    standalone generation.

    Sampling note: ``jax.random.categorical`` draws its Gumbel noise over
    the full (B, C) batch, so with sample=True the stream for one request
    legitimately depends on its batch slot (not on other rows' CONTENT —
    just the noise layout).  Greedy (sample=False) is bit-stable across
    batch compositions.

    frame_buckets : conditioning lengths (latent frames) to compile for.
    weight_quant/compute_dtype : forwarded to the decode scan —
        'int8'/bf16 are the measured single-stream frontiers (RESULTS.md).
    """

    def __init__(self, params, cfg, *,
                 frame_buckets: Sequence[int] = (10, 20, 40),
                 max_batch: int = 8,
                 sample: bool = False,
                 compute_dtype=None,
                 weight_quant: Optional[str] = None,
                 mesh=None):
        self._params = params
        self._cfg = cfg
        self._buckets = tuple(sorted(int(b) for b in frame_buckets))
        self._max_batch = int(max_batch)
        self._sample = sample
        self._compute_dtype = compute_dtype
        self._weight_quant = weight_quant
        self._mesh = mesh
        if mesh is not None and mesh.shape.get("model", 1) > 1:
            if compute_dtype is not None:
                raise ValueError(
                    "tensor-parallel decode composes with f32/int8, not "
                    "compute_dtype")
            if sample:
                raise ValueError(
                    "tensor-parallel decode serves greedy streams; "
                    "sampling is not wired")
        self._launches = 0
        self._tp_generate = None  # built lazily, cached across launches
        factor = 1
        if cfg.upsample_conditional_features:
            for s in cfg.upsample_scales:
                factor *= int(s)
        self._upsample_factor = factor

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        raise ValueError(
            f"conditioning of {n} frames exceeds the largest bucket "
            f"{self._buckets[-1]}")

    def synthesize(self, conds: Sequence[np.ndarray],
                   speaker_ids: Optional[Sequence[int]] = None,
                   seed: int = 0) -> List[SynthesisResult]:
        """conds: per-request (Tc, cin) local-conditioning arrays (e.g.
        upstream VQ-VAE latents or mels).  Returns trimmed waves in order."""
        import jax
        from vqvae_speech_tpu.models.wavenet.incremental import (
            wavenet_incremental_generate)

        order: Dict[int, List[int]] = {}
        for i, c in enumerate(conds):
            order.setdefault(self._bucket_for(c.shape[0]), []).append(i)

        results: List[Optional[SynthesisResult]] = [None] * len(conds)
        for bucket, idxs in sorted(order.items()):
            T = bucket * self._upsample_factor
            for at in range(0, len(idxs), self._max_batch):
                chunk = idxs[at:at + self._max_batch]
                cin = conds[chunk[0]].shape[-1]
                c = np.zeros((self._max_batch, bucket, cin), np.float32)
                for row, i in enumerate(chunk):
                    c[row, :conds[i].shape[0]] = conds[i]
                g = None
                if speaker_ids is not None:
                    g = np.zeros((self._max_batch,), np.int32)
                    for row, i in enumerate(chunk):
                        g[row] = speaker_ids[i]
                if (self._mesh is not None
                        and self._mesh.shape.get("model", 1) > 1):
                    # prepare_tp_decode hoists the host-side weight
                    # permute/quantize and caches one compiled program per
                    # (T, B) — re-preparing per launch would recompile
                    # every call and defeat the per-bucket contract
                    if self._tp_generate is None:
                        from vqvae_speech_tpu.parallel.tp_decode import (
                            prepare_tp_decode)
                        self._tp_generate = prepare_tp_decode(
                            self._params, self._cfg, self._mesh,
                            weight_quant=self._weight_quant)
                    _, emitted = self._tp_generate(
                        jax.random.PRNGKey(seed), T, c=c, g=g,
                        sample=False)
                else:
                    _, emitted = wavenet_incremental_generate(
                        self._params, self._cfg, jax.random.PRNGKey(seed),
                        T, c=c, g=g, sample=self._sample,
                        compute_dtype=self._compute_dtype,
                        weight_quant=self._weight_quant)
                emitted = np.asarray(emitted)
                self._launches += 1
                for row, i in enumerate(chunk):
                    n = conds[i].shape[0] * self._upsample_factor
                    results[i] = SynthesisResult(wave=emitted[row, :n],
                                                 bucket=bucket)
        return results  # type: ignore[return-value]

    @property
    def stats(self) -> dict:
        return {"launches": self._launches, "max_batch": self._max_batch,
                "upsample_factor": self._upsample_factor}


class BucketedParallelSynthesisServer:
    """Batch ONE-PASS vocoder synthesis: ClariNet IAF student or FloWaveNet
    reverse — the high-throughput serving tier (RESULTS.md: 1.0-2.6M
    samples/s vs the AR scan's 9k).

    Same static-shape discipline as the other servers: conditioning-length
    (mel-frame) buckets, fixed ``max_batch`` padded launches, one compiled
    program per bucket.  The param trees enter each launch as jit ARGUMENTS
    (closing over them would constant-fold the models' stacked flow params
    for minutes at compile time — RESULTS.md compile-size note).

    Determinism contract: each request's latent noise z is drawn from
    ``fold_in(PRNGKey(seed), its index in `conds`)`` — a request's wave
    depends only on (seed, its position, its conditioning), never on batch
    composition or bucketing (tested).  Both vocoders are per-row
    feed-forward convs, so padded batch rows are exact; because the
    coupling nets are NON-causal, samples within the conv receptive field
    of the padded tail differ from an unpadded run (the same caveat as any
    fixed-crop pipeline; send exact bucket-length conditioning when that
    matters).

    kind : 'flowavenet' (params, cfg from models/flowavenet) or
        'iaf_student' (params, cfg = student triple; requires
        teacher_params/teacher_cfg, whose conv stack performs the mel
        upsampling — reference synthesize.py does the same).
    temp : scale on z (the flow literature's sampling temperature;
        reference flow_wavenet/synthesize.py:60 uses 0.8).
    compute_dtype : e.g. jnp.bfloat16 for the MXU path (RESULTS.md).
    use_fused_chain : max_batch=1 only — run the vocoder's resblock
        chains as fused Pallas kernels (causal tiled for iaf_student,
        non-causal halo windows for flowavenet).  MEASURED (RESULTS.md):
        iaf_student 1.72x end-to-end — the recommended single-stream
        configuration; flowavenet 0.94x at paper scale (XLA's non-causal
        batch-1 convs are already MXU-efficient; the option is kept for
        A/B and future tile tuning, not as a speedup).
    """

    def __init__(self, kind: str, params, cfg, *,
                 teacher_params=None, teacher_cfg=None,
                 frame_buckets: Sequence[int] = (20, 40, 80),
                 max_batch: int = 8,
                 temp: float = 0.8,
                 compute_dtype=None,
                 use_fused_chain: bool = False):
        if kind not in ("flowavenet", "iaf_student"):
            raise ValueError(f"unknown parallel vocoder kind: {kind!r}")
        if kind == "iaf_student" and (teacher_params is None
                                      or teacher_cfg is None):
            raise ValueError("iaf_student needs teacher_params/teacher_cfg "
                             "for mel upsampling")
        if use_fused_chain and max_batch != 1:
            raise ValueError("use_fused_chain is the single-stream "
                             "(max_batch=1) path")
        self._kind = kind
        self._params = params
        self._cfg = cfg
        self._teacher_params = teacher_params
        self._teacher_cfg = teacher_cfg
        self._buckets = tuple(sorted(int(b) for b in frame_buckets))
        self._max_batch = int(max_batch)
        self._temp = float(temp)
        self._compute_dtype = compute_dtype
        self._use_fused_chain = bool(use_fused_chain)
        self._compiled: Dict[int, object] = {}
        self._launches = 0
        scales = (cfg.upsample_scales if kind == "flowavenet"
                  else teacher_cfg.upsample_scales)
        factor = 1
        for s in scales:
            factor *= int(s)
        self._upsample_factor = factor

    def _bucket_for(self, n: int) -> int:
        for b in self._buckets:
            if n <= b:
                return b
        raise ValueError(
            f"conditioning of {n} frames exceeds the largest bucket "
            f"{self._buckets[-1]}")

    def _build(self, bucket: int):
        import jax

        if self._kind == "flowavenet":
            from vqvae_speech_tpu.models.flowavenet import flowavenet_reverse

            fused_interpret = (self._use_fused_chain
                               and jax.default_backend() == "cpu")

            def run(params, _tp, z, c):
                return flowavenet_reverse(
                    params, self._cfg, z, c,
                    compute_dtype=self._compute_dtype,
                    use_fused=self._use_fused_chain,
                    interpret=fused_interpret)
        else:
            from vqvae_speech_tpu.models.clarinet import (
                gaussian_wavenet_upsample, wavenet_student_generate)

            # Pallas only runs in interpret mode on the CPU backend; the
            # compiled kernel path is the TPU serving configuration.
            fused_interpret = (self._use_fused_chain
                               and jax.default_backend() == "cpu")

            def run(params, teacher_params, z, c):
                c_up = gaussian_wavenet_upsample(teacher_params, c,
                                                 self._teacher_cfg)
                return wavenet_student_generate(
                    params, self._cfg, z, c_up,
                    compute_dtype=self._compute_dtype,
                    use_fused=self._use_fused_chain,
                    interpret=fused_interpret)

        return jax.jit(run)

    def synthesize(self, conds: Sequence[np.ndarray],
                   seed: int = 0) -> List[SynthesisResult]:
        """conds: per-request (Tc, cin) mel arrays.  Returns float waves
        trimmed to each request's true length, in order."""
        import jax
        import jax.numpy as jnp

        order: Dict[int, List[int]] = {}
        for i, c in enumerate(conds):
            order.setdefault(self._bucket_for(c.shape[0]), []).append(i)

        results: List[Optional[SynthesisResult]] = [None] * len(conds)
        base_key = jax.random.PRNGKey(seed)
        for bucket, idxs in sorted(order.items()):
            fn = self._compiled.get(bucket)
            if fn is None:
                fn = self._compiled[bucket] = self._build(bucket)
            T = bucket * self._upsample_factor
            for at in range(0, len(idxs), self._max_batch):
                chunk = idxs[at:at + self._max_batch]
                cin = conds[chunk[0]].shape[-1]
                c = np.zeros((self._max_batch, bucket, cin), np.float32)
                z = np.zeros((self._max_batch, T, 1), np.float32)
                for row, i in enumerate(chunk):
                    c[row, :conds[i].shape[0]] = conds[i]
                    z[row] = np.asarray(jax.random.normal(
                        jax.random.fold_in(base_key, i), (T, 1),
                        jnp.float32)) * self._temp
                waves = np.asarray(fn(self._params, self._teacher_params,
                                      z, c))
                self._launches += 1
                for row, i in enumerate(chunk):
                    n = conds[i].shape[0] * self._upsample_factor
                    results[i] = SynthesisResult(wave=waves[row, :n, 0],
                                                 bucket=bucket)
        return results  # type: ignore[return-value]

    @property
    def stats(self) -> dict:
        return {"compiled_buckets": sorted(self._compiled),
                "launches": self._launches, "max_batch": self._max_batch,
                "upsample_factor": self._upsample_factor}


class ContinuousSynthesisServer:
    """Continuous-batching AR synthesis: device-resident decode slots.

    The bucketed AR server launches whole-utterance scans, so a mixed-length
    batch pays head-of-line blocking (every request rides the longest
    bucket) and queued requests wait for the full launch.  This server
    applies LLM-style continuous batching to the WaveNet decode loop
    (models/wavenet/chunked.py): ``slots`` decode streams live on device,
    every launch advances ALL of them ``chunk_size`` samples, and requests
    join/retire at chunk boundaries — the batch stays full under
    mixed-length traffic and a queued request starts within one chunk
    (~chunk_size/rate seconds) instead of one utterance.

    Contracts (tests/test_continuous_serve.py):
    * greedy streams are bit-identical to a standalone batch-1 greedy
      decode of the same request (conditioning is hoisted at admission at
      batch 1, exactly like the standalone scan);
    * a request's stream — greedy or sampled — is independent of batch
      composition and admission time: sampling uses per-slot PRNG chains
      seeded from the request's own key (`fold_in(PRNGKey(seed), index)`),
      unlike the bucketed server's shared-key categorical;
    * ONE compiled chunk program serves the whole lifetime (static
      (slots, chunk_size)); admission is a donated .at[slot] update.

    Online API: ``submit()`` enqueues a request and returns its id,
    ``step()`` advances the pool one chunk and returns the requests that
    completed in it, ``collect()`` fetches a finished result.  ``run()``
    is the offline drain built on them.

    max_frames : longest admissible conditioning length (latent frames);
        fixes the device-resident conditioning buffer's static shape.
    """

    def __init__(self, params, cfg, *,
                 slots: int = 8,
                 chunk_size: int = 256,
                 max_frames: int = 40,
                 sample: bool = False,
                 compute_dtype=None,
                 weight_quant: Optional[str] = None):
        from collections import deque
        from vqvae_speech_tpu.models.wavenet.chunked import init_decode_slots

        self._params = params
        self._cfg = cfg
        self._slots = int(slots)
        self._chunk = int(chunk_size)
        self._sample = bool(sample)
        self._compute_dtype = compute_dtype
        self._weight_quant = weight_quant
        factor = 1
        if cfg.upsample_conditional_features:
            for s in cfg.upsample_scales:
                factor *= int(s)
        self._upsample_factor = factor
        self._max_t = int(max_frames) * factor
        self._prep, self._state = init_decode_slots(
            params, cfg, self._slots, self._max_t,
            compute_dtype=compute_dtype, weight_quant=weight_quant)
        self._queue = deque()          # request ids awaiting a slot
        self._requests: Dict[int, dict] = {}
        self._results: Dict[int, SynthesisResult] = {}
        self._active: Dict[int, list] = {}   # slot -> [req id, remaining,
        self._next_id = 0                    #          parts]
        self._launches = 0
        self._busy_steps = 0
        self._slot_steps = 0
        self._wait_chunks: List[int] = []    # submit -> completion, chunks
        # per-request latency attribution (chunks): admission wait
        # (submit -> slot) and decode (slot -> completion) — the metric
        # continuous batching exists to improve vs whole-utterance launches
        self._admission_wait_chunks: List[int] = []
        self._decode_chunks: List[int] = []

    @property
    def pending(self) -> int:
        """Requests submitted but not yet completed."""
        return len(self._queue) + len(self._active)

    def submit(self, cond: np.ndarray, speaker_id: Optional[int] = None,
               seed: int = 0) -> int:
        """Enqueue one request; returns its id.  The stream depends only on
        (params, cond, speaker_id, seed, id) — never on what shares the
        pool or when the request is admitted."""
        if cond.shape[0] * self._upsample_factor > self._max_t:
            raise ValueError(
                f"conditioning of {cond.shape[0]} frames exceeds "
                f"max_frames {self._max_t // self._upsample_factor}")
        rid = self._next_id
        self._next_id += 1
        self._requests[rid] = dict(cond=cond, speaker_id=speaker_id,
                                   seed=seed, submitted=self._launches)
        self._queue.append(rid)
        return rid

    def step(self) -> List[int]:
        """Admit queued requests into free slots, advance every slot one
        chunk, and return the ids of requests that completed in it."""
        import jax
        import jax.numpy as jnp
        from vqvae_speech_tpu.models.wavenet.chunked import (
            admit_slot, decode_chunk, slot_conditioning)

        if not self._queue and not self._active:
            return []
        if not self._active:
            # pool fully drained: rewind the shared clock so it cannot
            # creep toward int32 overflow across server lifetime (a busy
            # pool only advances it while streams are in flight)
            self._state = dict(
                self._state,
                g=jnp.zeros((), jnp.int32),
                start=jnp.zeros((self._slots,), jnp.int32))
        for s in range(self._slots):
            if s in self._active or not self._queue:
                continue
            rid = self._queue.popleft()
            req = self._requests[rid]
            # zero-pad to the slot capacity: slot_conditioning is ONE
            # compiled program over the static (max_frames, cin) shape
            max_frames = self._max_t // self._upsample_factor
            c = np.zeros((max_frames, req["cond"].shape[-1]), np.float32)
            c[:req["cond"].shape[0]] = req["cond"]
            rows = slot_conditioning(
                self._params, self._cfg, c, req["speaker_id"], self._max_t,
                compute_dtype=self._compute_dtype)
            key = jax.random.fold_in(jax.random.PRNGKey(req["seed"]), rid)
            req["admitted"] = self._launches
            self._state = admit_slot(self._state, s, rows, key)
            self._active[s] = [
                rid, req["cond"].shape[0] * self._upsample_factor, []]
        self._state, emitted = decode_chunk(
            self._prep, self._state, self._cfg, self._chunk,
            sample=self._sample)
        emitted = np.asarray(emitted)
        self._launches += 1
        self._slot_steps += self._slots * self._chunk
        done = []
        for s in list(self._active):
            rid, remaining, parts = self._active[s]
            take = min(remaining, self._chunk)
            parts.append(emitted[s, :take])
            self._busy_steps += take
            if remaining <= self._chunk:
                self._results[rid] = SynthesisResult(
                    wave=np.concatenate(parts),
                    bucket=self._max_t // self._upsample_factor)
                self._wait_chunks.append(
                    self._launches - self._requests[rid]["submitted"])
                self._admission_wait_chunks.append(
                    self._requests[rid]["admitted"]
                    - self._requests[rid]["submitted"])
                self._decode_chunks.append(
                    self._launches - self._requests[rid]["admitted"])
                del self._active[s]
                del self._requests[rid]
                done.append(rid)
            else:
                self._active[s][1] = remaining - take
        return done

    def collect(self, request_id: int) -> Optional[SynthesisResult]:
        """Fetch (and forget) a completed request's result, or None if it
        is still in flight."""
        return self._results.pop(request_id, None)

    def run(self, conds: Sequence[np.ndarray],
            speaker_ids: Optional[Sequence[int]] = None,
            seed: int = 0) -> List[SynthesisResult]:
        """Offline drain: submit everything, step until empty.

        conds: per-request (Tc, cin) local-conditioning arrays.  Returns
        trimmed waves in request order."""
        for c in conds:                 # validate before enqueuing any
            if c.shape[0] * self._upsample_factor > self._max_t:
                raise ValueError(
                    f"conditioning of {c.shape[0]} frames exceeds "
                    f"max_frames {self._max_t // self._upsample_factor}")
        ids = [self.submit(c,
                           None if speaker_ids is None else speaker_ids[i],
                           seed)
               for i, c in enumerate(conds)]
        while self.pending:
            self.step()
        return [self.collect(rid) for rid in ids]  # type: ignore

    @property
    def stats(self) -> dict:
        import numpy as _np

        util = (self._busy_steps / self._slot_steps
                if self._slot_steps else 0.0)
        waits = self._wait_chunks

        def dist(xs):
            if not xs:
                return None
            a = _np.asarray(xs, _np.float64)
            return {"mean": round(float(a.mean()), 2),
                    "p50": float(_np.percentile(a, 50)),
                    "p90": float(_np.percentile(a, 90)),
                    "max": float(a.max())}

        return {"launches": self._launches, "slots": self._slots,
                "chunk_size": self._chunk,
                "slot_utilization": round(util, 4),
                "mean_latency_chunks": (round(sum(waits) / len(waits), 2)
                                        if waits else 0.0),
                # per-request attribution, in chunks (multiply by the
                # measured seconds/launch for wall-clock): admission wait
                # is what continuous batching exists to bound (<= 1 chunk
                # when a slot is free vs a whole utterance for the
                # bucketed server)
                "latency_chunks": dist(self._wait_chunks),
                "admission_wait_chunks": dist(self._admission_wait_chunks),
                "decode_chunks": dist(self._decode_chunks),
                "upsample_factor": self._upsample_factor}
