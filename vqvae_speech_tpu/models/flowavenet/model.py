"""FloWaveNet: flow-based parallel vocoder (exact MLE + one-pass synthesis).

Capability-parity with reference src/flow_wavenet/model.py:35-289 and
src/flow_wavenet/modules.py (non-causal WaveNet with zero-init output conv):

* ActNorm with data-dependent init + logdet,
* AffineCoupling: a non-causal WaveNet maps (in_a, c_a) -> (log_s, t);
  ``out_b = (in_b - t) * exp(-log_s)``; logdet = -sum(log_s),
* change_order half-swap between flows,
* Block: time-squeeze x2 -> n_flow Flows -> optional multi-scale split with a
  WaveNet Gaussian prior,
* forward -> (log_p, logdet) per-dim for MLE; reverse inverts everything for
  single-pass synthesis,
* ConvTranspose2d (3, 2s) LC upsampling (scales [16, 16] = hop 256).

TPU notes: channels-last activations, squeeze/unsqueeze are pure reshapes,
and the data-dependent ActNorm init is an explicit `actnorm_initialize` pass
returning updated params (functional, instead of mutate-on-first-forward).
"""
from dataclasses import dataclass
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vqvae_speech_tpu.models.clarinet.modules import (
    conv_init, conv_apply, upsample_init, upsample_apply)


# -------------------- non-causal WaveNet (coupling net) --------------------


@dataclass(frozen=True)
class CouplingNetConfig:
    in_channels: int
    out_channels: int
    num_blocks: int = 1
    num_layers: int = 6
    residual_channels: int = 256
    gate_channels: int = 256
    skip_channels: int = 256
    kernel_size: int = 3
    cin_channels: int = 80
    causal: bool = False

    @property
    def total_layers(self):
        return self.num_blocks * self.num_layers

    def dilation(self, i):
        return 2 ** (i % self.num_layers)


def _zero_conv_init(in_ch, out_ch, dtype=jnp.float32):
    """ZeroConv1d: zero 1x1 conv with learned exp(scale*3) gain
    (reference modules.py:50-63)."""
    return {
        "w": jnp.zeros((1, in_ch, out_ch), dtype),
        "b": jnp.zeros((out_ch,), dtype),
        "scale": jnp.zeros((out_ch,), dtype),
    }


def _zero_conv_apply(p, x):
    y = jnp.einsum("btc,kco->bto", x, p["w"]) + p["b"]
    return y * jnp.exp(p["scale"] * 3.0)


def coupling_net_init(key, cfg: CouplingNetConfig, dtype=jnp.float32):
    from vqvae_speech_tpu.models.clarinet.modules import resblock_init

    ks = jax.random.split(key, cfg.total_layers + 2)
    return {
        "front_conv": conv_init(ks[0], cfg.in_channels,
                                cfg.residual_channels, 3, dtype),
        "res_blocks": [
            resblock_init(ks[1 + i], cfg.residual_channels,
                          cfg.gate_channels, cfg.skip_channels,
                          cfg.kernel_size, cfg.cin_channels, dtype)
            for i in range(cfg.total_layers)],
        "final_conv_1": conv_init(ks[-1], cfg.skip_channels,
                                  cfg.skip_channels, 1, dtype),
        "final_zero_conv": _zero_conv_init(cfg.skip_channels,
                                           cfg.out_channels, dtype),
    }


def coupling_net_apply(params, cfg: CouplingNetConfig, x, c,
                       use_fused=False, interpret=False, fused_tile=1024):
    from vqvae_speech_tpu.models.clarinet.modules import resblock_apply

    h = jax.nn.relu(conv_apply(params["front_conv"], x, 3, causal=cfg.causal))
    if use_fused:
        # batch-1 halo-window Pallas chains (ops/fused_resblock.py) — the
        # single-stream synthesis latency path; front/finals stay XLA
        from vqvae_speech_tpu.ops.fused_resblock import (
            fused_block_chain_nc, stack_block_weights)

        if cfg.causal or x.shape[0] != 1:
            raise ValueError("fused coupling chain is the non-causal "
                             "batch-1 path")
        nl = cfg.num_layers
        dil = tuple(cfg.dilation(i) for i in range(nl))
        T = h.shape[1]
        skip = jnp.zeros((T, cfg.skip_channels), jnp.float32)
        for b in range(cfg.num_blocks):
            stacked = stack_block_weights(
                params["res_blocks"][b * nl:(b + 1) * nl],
                compute_dtype=h.dtype)
            h0, s = fused_block_chain_nc(
                h[0], c[0, :T], stacked, layers=nl,
                kernel_size=cfg.kernel_size, dilations=dil,
                tile=fused_tile, interpret=interpret)
            h = h0[None]
            skip = skip + s
        skip = skip[None].astype(x.dtype)
    else:
        skip = 0.0
        for i, p in enumerate(params["res_blocks"]):
            h, s = resblock_apply(p, h, c, cfg.kernel_size, cfg.dilation(i),
                                  cfg.causal)
            skip = skip + s
    out = jax.nn.relu(skip)
    out = jax.nn.relu(conv_apply(params["final_conv_1"], out, 1))
    return _zero_conv_apply(params["final_zero_conv"], out)


# -------------------- flow pieces --------------------


def actnorm_init(in_channel, dtype=jnp.float32):
    return {"loc": jnp.zeros((in_channel,), dtype),
            "scale": jnp.ones((in_channel,), dtype)}


def actnorm_forward(p, x):
    """x: (B, T, C) -> (scale*(x+loc), logdet) with
    logdet = B*T*sum(log|scale|) (reference model.py:64-79)."""
    B, T = x.shape[0], x.shape[1]
    logdet = jnp.sum(jnp.log(jnp.abs(p["scale"]))) * B * T
    return p["scale"] * (x + p["loc"]), logdet


def actnorm_reverse(p, y):
    return y / p["scale"] - p["loc"]


def _data_dependent_actnorm(x):
    """Per-channel -mean and 1/(std+1e-6) from a data batch
    (reference model.py:45-62; std is the unbiased torch .std())."""
    flat = x.reshape(-1, x.shape[-1])
    mean = jnp.mean(flat, axis=0)
    n = flat.shape[0]
    std = jnp.sqrt(jnp.sum(jnp.square(flat - mean), axis=0) / (n - 1))
    return {"loc": -mean, "scale": 1.0 / (std + 1e-6)}


def _change_order(x, c):
    xa, xb = jnp.split(x, 2, axis=-1)
    ca, cb = jnp.split(c, 2, axis=-1)
    return (jnp.concatenate([xb, xa], -1), jnp.concatenate([cb, ca], -1))


def _squeeze(x):
    """(B, T, C) -> (B, T//2, 2C), new channel ch = c*2 + parity — the exact
    interleaved order of the reference's view/permute squeeze
    (model.py:184-188), so couple/split channel groupings match."""
    B, T, C = x.shape
    x = x.reshape(B, T // 2, 2, C)           # (B, T2, parity, C)
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T // 2, 2 * C)


def _unsqueeze(x):
    B, T2, C2 = x.shape
    x = x.reshape(B, T2, C2 // 2, 2)          # (B, T2, c, parity)
    return jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T2 * 2, C2 // 2)


# -------------------- full model --------------------


@dataclass(frozen=True)
class FlowavenetConfig:
    in_channel: int = 1
    cin_channel: int = 80
    n_block: int = 8
    n_flow: int = 6
    n_layer: int = 2
    affine: bool = True
    block_per_split: int = 8
    filter_size: int = 256
    upsample_scales: Sequence[int] = (16, 16)

    def split_at(self, i):
        return bool(not ((i + 1) % self.block_per_split
                         or i == self.n_block - 1))


def _block_channels(cfg: FlowavenetConfig):
    """(in_channel, cin_channel) entering each block (pre-squeeze)."""
    chans = []
    in_ch, cin_ch = cfg.in_channel, cfg.cin_channel
    for i in range(cfg.n_block):
        chans.append((in_ch, cin_ch))
        cin_ch *= 2
        if not cfg.split_at(i):
            in_ch *= 2
    return chans


def flowavenet_init(key, cfg: FlowavenetConfig, dtype=jnp.float32):
    blocks = []
    keys = jax.random.split(key, cfg.n_block + 1)
    for i, (in_ch, cin_ch) in enumerate(_block_channels(cfg)):
        sq, sqc = in_ch * 2, cin_ch * 2
        bkeys = jax.random.split(keys[i], cfg.n_flow + 1)
        flows = []
        for f in range(cfg.n_flow):
            net_cfg = CouplingNetConfig(
                in_channels=sq // 2, out_channels=sq if cfg.affine else sq // 2,
                num_blocks=1, num_layers=cfg.n_layer,
                residual_channels=cfg.filter_size,
                gate_channels=cfg.filter_size, skip_channels=cfg.filter_size,
                cin_channels=sqc // 2, causal=False)
            flows.append({
                "actnorm": actnorm_init(sq, dtype),
                "coupling": coupling_net_init(bkeys[f], net_cfg, dtype),
            })
        block = {"flows": flows}
        if cfg.split_at(i):
            prior_cfg = CouplingNetConfig(
                in_channels=sq // 2, out_channels=sq, num_blocks=1,
                num_layers=2, residual_channels=256, gate_channels=256,
                skip_channels=256, cin_channels=sqc, causal=False)
            block["prior"] = coupling_net_init(bkeys[-1], prior_cfg, dtype)
        blocks.append(block)
    return {
        "blocks": blocks,
        "upsample_conv": upsample_init(keys[-1], cfg.upsample_scales, dtype),
    }


def _flow_net_cfg(cfg: FlowavenetConfig, sq, sqc):
    return CouplingNetConfig(
        in_channels=sq // 2, out_channels=sq if cfg.affine else sq // 2,
        num_blocks=1, num_layers=cfg.n_layer,
        residual_channels=cfg.filter_size, gate_channels=cfg.filter_size,
        skip_channels=cfg.filter_size, cin_channels=sqc // 2, causal=False)


def _coupling_forward(p, net_cfg, x, c, affine):
    in_a, in_b = jnp.split(x, 2, axis=-1)
    c_a, _ = jnp.split(c, 2, axis=-1)
    net_out = coupling_net_apply(p, net_cfg, in_a, c_a)
    if affine:
        log_s, t = jnp.split(net_out, 2, axis=-1)
        out_b = (in_b - t) * jnp.exp(-log_s)
        # accumulate the logdet in f32 regardless of the compute dtype
        logdet = jnp.sum(-log_s.astype(jnp.float32))
    else:
        out_b = in_b + net_out
        logdet = jnp.float32(0.0)
    return jnp.concatenate([in_a, out_b], -1), logdet


def _coupling_reverse(p, net_cfg, y, c, affine, use_fused=False,
                      interpret=False):
    out_a, out_b = jnp.split(y, 2, axis=-1)
    c_a, _ = jnp.split(c, 2, axis=-1)
    net_out = coupling_net_apply(p, net_cfg, out_a, c_a,
                                 use_fused=use_fused, interpret=interpret)
    if affine:
        log_s, t = jnp.split(net_out, 2, axis=-1)
        in_b = out_b * jnp.exp(log_s) + t
    else:
        in_b = out_b - net_out
    return jnp.concatenate([out_a, in_b], -1)


def flowavenet_upsample(params, c, cfg: FlowavenetConfig):
    return upsample_apply(params["upsample_conv"], c, cfg.upsample_scales)


def _stack_flows(flows):
    """Stack a block's per-flow param trees along a leading axis so the flow
    loop can run as ONE ``lax.scan`` body instead of ``n_flow`` unrolled
    copies.  All flows in a block share shapes, so this is always legal.

    TPU note: paper scale is 8 blocks x 6 flows = 48 coupling WaveNets; fully
    unrolled, the serialized HLO is large enough to break remote-compile
    transports and costs minutes of compile time.  Scanning over flows keeps
    the program ~n_flow times smaller with bit-identical math."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *flows)


def flowavenet_forward(params, cfg: FlowavenetConfig, x, c,
                       compute_dtype=None):
    """x: (B, T, 1); c: (B, Tc, cin).  Returns (log_p, logdet) per-dim
    (reference model.py:245-257).

    ``compute_dtype=jnp.bfloat16`` = mixed precision for MLE training: the
    coupling/prior WaveNets and affines run in bf16 on the MXU, while ALL
    log-density math stays f32 — the ActNorm logdet is data-independent and
    computed from the uncast f32 scales, the coupling logdet sums f32-cast
    log_s, and the Gaussian log-probs cast their inputs up before squaring.
    """
    B, T = x.shape[0], x.shape[1]
    fparams = params
    if compute_dtype is not None:
        fparams = jax.tree_util.tree_map(
            lambda v: v.astype(compute_dtype), params)
        x = x.astype(compute_dtype)
        c = c.astype(compute_dtype)
    c = flowavenet_upsample(fparams, c, cfg)
    out = x
    logdet_sum, log_p_sum = jnp.float32(0.0), jnp.float32(0.0)
    for i, block in enumerate(fparams["blocks"]):
        in_ch, cin_ch = _block_channels(cfg)[i]
        sq, sqc = in_ch * 2, cin_ch * 2
        net_cfg = _flow_net_cfg(cfg, sq, sqc)
        out, c = _squeeze(out), _squeeze(c)
        # ActNorm logdet is a pure function of the (f32 master) scales and
        # the SQUEEZED time length at this depth (T / 2^(i+1)): the reference
        # computes ``torch.sum(log_abs) * B * T`` with T = x.size(2) AFTER
        # the block's squeeze (model.py:64-79 + forward at 245-257).
        T_sq = out.shape[1]
        for flow32 in params["blocks"][i]["flows"]:
            logdet_sum = logdet_sum + B * T_sq * jnp.sum(
                jnp.log(jnp.abs(flow32["actnorm"]["scale"]))
            ).astype(jnp.float32)

        def flow_body(carry, flow, net_cfg=net_cfg):
            out, c, logdet = carry
            out = flow["actnorm"]["scale"] * (out + flow["actnorm"]["loc"])
            out, det_c = _coupling_forward(flow["coupling"], net_cfg, out, c,
                                           cfg.affine)
            out, c = _change_order(out, c)
            return (out, c, logdet + det_c), None

        (out, c, logdet_sum), _ = jax.lax.scan(
            flow_body, (out, c, logdet_sum), _stack_flows(block["flows"]))
        if cfg.split_at(i):
            out, z = jnp.split(out, 2, axis=-1)
            prior_cfg = CouplingNetConfig(
                in_channels=sq // 2, out_channels=sq, num_blocks=1,
                num_layers=2, residual_channels=256, gate_channels=256,
                skip_channels=256, cin_channels=sqc, causal=False)
            mean, log_sd = jnp.split(
                coupling_net_apply(block["prior"], prior_cfg, out, c), 2,
                axis=-1)
            z32 = z.astype(jnp.float32)
            mean32 = mean.astype(jnp.float32)
            log_sd32 = log_sd.astype(jnp.float32)
            log_p_sum = log_p_sum + jnp.sum(
                -0.5 * np.log(2 * np.pi) - log_sd32
                - 0.5 * jnp.square(z32 - mean32) / jnp.exp(2 * log_sd32))
    out32 = out.astype(jnp.float32)
    log_p_sum = log_p_sum + 0.5 * jnp.sum(
        -np.log(2.0 * np.pi) - jnp.square(out32))
    return log_p_sum / (B * T), logdet_sum / (B * T)


def flowavenet_reverse(params, cfg: FlowavenetConfig, z, c, rng=None,
                       temp: float = 1.0, compute_dtype=None,
                       use_fused=False, interpret=False):
    """Invert the flow: z: (B, T, 1) noise -> waveform (B, T, 1)
    (reference model.py:259-282).  ``compute_dtype=jnp.bfloat16`` runs the
    coupling convs on the MXU bf16 path (waveform cast back to f32).

    ``use_fused`` (batch-1 only) runs coupling resblock chains as fused
    halo-window Pallas kernels (ops/fused_resblock.py) on blocks whose
    conditioning width keeps the weight stack VMEM-resident (the early,
    compute-dominant blocks — channel doubling under squeeze makes late
    blocks wide but they carry exponentially less time)."""
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda p: p.astype(compute_dtype), params)
        z = z.astype(compute_dtype)
        c = c.astype(compute_dtype)
    if c.shape[1] != z.shape[1]:
        c = flowavenet_upsample(params, c, cfg)
    x = z
    z_list = []
    # squeeze all the way down, collecting split z's
    for i in range(cfg.n_block):
        x, c = _squeeze(x), _squeeze(c)
        if cfg.split_at(i):
            x, zz = jnp.split(x, 2, axis=-1)
            z_list.append(zz)

    chans = _block_channels(cfg)
    for j, i in enumerate(range(cfg.n_block - 1, -1, -1)):
        block = params["blocks"][i]
        in_ch, cin_ch = chans[i]
        sq, sqc = in_ch * 2, cin_ch * 2
        net_cfg = _flow_net_cfg(cfg, sq, sqc)
        if cfg.split_at(i):
            prior_cfg = CouplingNetConfig(
                in_channels=sq // 2, out_channels=sq, num_blocks=1,
                num_layers=2, residual_channels=256, gate_channels=256,
                skip_channels=256, cin_channels=sqc, causal=False)
            mean, log_sd = jnp.split(
                coupling_net_apply(block["prior"], prior_cfg, x, c), 2,
                axis=-1)
            eps = z_list[(i + 1) // cfg.block_per_split - 1]
            x = jnp.concatenate([x, mean + jnp.exp(log_sd) * eps], -1)
        # fuse only while the stacked coupling weights (dominated by the
        # 2x cin x G conditioning projections) stay VMEM-resident
        fuse_here = (use_fused and z.shape[0] == 1
                     and net_cfg.cin_channels <= 1024)

        def flow_body(carry, flow, net_cfg=net_cfg, fuse=fuse_here):
            x, c = carry
            x, c = _change_order(x, c)
            x = _coupling_reverse(flow["coupling"], net_cfg, x, c, cfg.affine,
                                  use_fused=fuse, interpret=interpret)
            x = actnorm_reverse(flow["actnorm"], x)
            return (x, c), None

        (x, c), _ = jax.lax.scan(flow_body, (x, c),
                                 _stack_flows(block["flows"]), reverse=True)
        x, c = _unsqueeze(x), _unsqueeze(c)
    return x.astype(jnp.float32)


def actnorm_initialize(params, cfg: FlowavenetConfig, x, c):
    """Data-dependent ActNorm init: run the forward pass once, replacing each
    ActNorm's params with the batch statistics of its input (functional
    version of the reference's initialize-on-first-forward,
    model.py:45-62).  Returns updated params."""
    params = jax.tree_util.tree_map(lambda v: v, params)  # shallow copy tree
    c_up = flowavenet_upsample(params, c, cfg)
    out = x
    for i, block in enumerate(params["blocks"]):
        in_ch, cin_ch = _block_channels(cfg)[i]
        sq, sqc = in_ch * 2, cin_ch * 2
        net_cfg = _flow_net_cfg(cfg, sq, sqc)
        out, c_up = _squeeze(out), _squeeze(c_up)
        for flow in block["flows"]:
            flow["actnorm"] = _data_dependent_actnorm(out)
            out, _ = actnorm_forward(flow["actnorm"], out)
            out, _ = _coupling_forward(flow["coupling"], net_cfg, out, c_up,
                                       cfg.affine)
            out, c_up = _change_order(out, c_up)
        if cfg.split_at(i):
            out, _ = jnp.split(out, 2, axis=-1)
    return params
