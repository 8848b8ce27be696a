"""Independent torch reference implementations used ONLY as test fixtures.

These re-derive the documented model math (SURVEY.md §2.1 component specs) in
plain torch so that the JAX models + the torch-name checkpoint mapper
(io/checkpoints.py) can be validated end-to-end: we build a torch state dict
here, map it into our pytrees, and require the two frameworks to agree on
random inputs. State-dict key names intentionally match the reference
checkpoints' naming so the mapper is exercised exactly as in production.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------
def timestep_embedding(t, dim, time_factor=1000.0):
    # reference forward passes time_factor positionally into max_period
    # (hunyuan3ddit.py:392) -> production max_period == 1000
    t = t.float() * time_factor
    half = dim // 2
    freqs = torch.exp(-math.log(time_factor) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class MLPEmbedder(nn.Module):
    def __init__(self, in_dim, hidden):
        super().__init__()
        self.in_layer = nn.Linear(in_dim, hidden)
        self.out_layer = nn.Linear(hidden, hidden)

    def forward(self, x):
        return self.out_layer(F.silu(self.in_layer(x)))


class RMSNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.scale = nn.Parameter(torch.randn(dim))

    def forward(self, x):
        rrms = torch.rsqrt(torch.mean(x.float() ** 2, dim=-1, keepdim=True) + 1e-6)
        return (x.float() * rrms).to(x.dtype) * self.scale


class QKNorm(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.query_norm = RMSNorm(dim)
        self.key_norm = RMSNorm(dim)


class SelfAttention(nn.Module):
    def __init__(self, dim, heads, qkv_bias=True):
        super().__init__()
        self.qkv = nn.Linear(dim, 3 * dim, bias=qkv_bias)
        self.norm = QKNorm(dim // heads)
        self.proj = nn.Linear(dim, dim)


def _split_qkv(qkv, heads):
    b, l, w = qkv.shape
    d = w // (3 * heads)
    x = qkv.view(b, l, 3, heads, d).permute(2, 0, 3, 1, 4)
    return x[0], x[1], x[2]


def _attn(q, k, v):
    x = F.scaled_dot_product_attention(q, k, v)
    b, h, l, d = x.shape
    return x.transpose(1, 2).reshape(b, l, h * d)


class Modulation(nn.Module):
    def __init__(self, dim, mult):
        super().__init__()
        self.mult = mult
        self.lin = nn.Linear(dim, mult * dim)

    def forward(self, vec):
        return self.lin(F.silu(vec))[:, None, :].chunk(self.mult, dim=-1)


class DoubleStreamBlock(nn.Module):
    def __init__(self, h, heads, mlp_ratio=4.0, qkv_bias=True):
        super().__init__()
        mh = int(h * mlp_ratio)
        self.heads = heads
        self.img_mod = Modulation(h, 6)
        self.img_norm1 = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)
        self.img_attn = SelfAttention(h, heads, qkv_bias)
        self.img_norm2 = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)
        self.img_mlp = nn.Sequential(nn.Linear(h, mh), nn.GELU(approximate="tanh"),
                                     nn.Linear(mh, h))
        self.txt_mod = Modulation(h, 6)
        self.txt_norm1 = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)
        self.txt_attn = SelfAttention(h, heads, qkv_bias)
        self.txt_norm2 = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)
        self.txt_mlp = nn.Sequential(nn.Linear(h, mh), nn.GELU(approximate="tanh"),
                                     nn.Linear(mh, h))

    def forward(self, img, txt, vec):
        i0, i1, i2, i3, i4, i5 = self.img_mod(vec)
        t0, t1, t2, t3, t4, t5 = self.txt_mod(vec)
        im = (1 + i1) * self.img_norm1(img) + i0
        iq, ik, iv = _split_qkv(self.img_attn.qkv(im), self.heads)
        iq = self.img_attn.norm.query_norm(iq)
        ik = self.img_attn.norm.key_norm(ik)
        tm = (1 + t1) * self.txt_norm1(txt) + t0
        tq, tk, tv = _split_qkv(self.txt_attn.qkv(tm), self.heads)
        tq = self.txt_attn.norm.query_norm(tq)
        tk = self.txt_attn.norm.key_norm(tk)
        q = torch.cat([tq, iq], dim=2)
        k = torch.cat([tk, ik], dim=2)
        v = torch.cat([tv, iv], dim=2)
        attn = _attn(q, k, v)
        ta, ia = attn[:, : txt.shape[1]], attn[:, txt.shape[1]:]
        img = img + i2 * self.img_attn.proj(ia)
        img = img + i5 * self.img_mlp((1 + i4) * self.img_norm2(img) + i3)
        txt = txt + t2 * self.txt_attn.proj(ta)
        txt = txt + t5 * self.txt_mlp((1 + t4) * self.txt_norm2(txt) + t3)
        return img, txt


class SingleStreamBlock(nn.Module):
    def __init__(self, h, heads, mlp_ratio=4.0):
        super().__init__()
        self.h = h
        self.heads = heads
        self.mh = int(h * mlp_ratio)
        self.linear1 = nn.Linear(h, 3 * h + self.mh)
        self.linear2 = nn.Linear(h + self.mh, h)
        self.norm = QKNorm(h // heads)
        self.pre_norm = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)
        self.modulation = Modulation(h, 3)

    def forward(self, x, vec):
        shift, scale, gate = self.modulation(vec)
        xm = (1 + scale) * self.pre_norm(x) + shift
        qkv, mlp = torch.split(self.linear1(xm), [3 * self.h, self.mh], dim=-1)
        q, k, v = _split_qkv(qkv, self.heads)
        q = self.norm.query_norm(q)
        k = self.norm.key_norm(k)
        attn = _attn(q, k, v)
        return x + gate * self.linear2(torch.cat([attn, F.gelu(mlp, approximate="tanh")], -1))


class LastLayer(nn.Module):
    def __init__(self, h, out):
        super().__init__()
        self.norm_final = nn.LayerNorm(h, elementwise_affine=False, eps=1e-6)
        self.linear = nn.Linear(h, out)
        self.adaLN_modulation = nn.Sequential(nn.SiLU(), nn.Linear(h, 2 * h))

    def forward(self, x, vec):
        shift, scale = self.adaLN_modulation(vec).chunk(2, dim=1)
        return self.linear((1 + scale[:, None]) * self.norm_final(x) + shift[:, None])


class TorchDiT(nn.Module):
    def __init__(self, in_channels=8, context_in_dim=16, hidden=64, heads=2,
                 depth=2, depth_single=2, guidance_embed=False):
        super().__init__()
        self.guidance_embed = guidance_embed
        self.latent_in = nn.Linear(in_channels, hidden)
        self.time_in = MLPEmbedder(256, hidden)
        self.cond_in = nn.Linear(context_in_dim, hidden)
        if guidance_embed:
            self.guidance_in = MLPEmbedder(256, hidden)
        self.double_blocks = nn.ModuleList(
            [DoubleStreamBlock(hidden, heads) for _ in range(depth)])
        self.single_blocks = nn.ModuleList(
            [SingleStreamBlock(hidden, heads) for _ in range(depth_single)])
        self.final_layer = LastLayer(hidden, in_channels)

    def forward(self, x, t, cond, guidance=None):
        latent = self.latent_in(x)
        vec = self.time_in(timestep_embedding(t, 256))
        if self.guidance_embed:
            vec = vec + self.guidance_in(timestep_embedding(guidance, 256))
        cond = self.cond_in(cond)
        for blk in self.double_blocks:
            latent, cond = blk(latent, cond, vec)
        x = torch.cat([cond, latent], dim=1)
        for blk in self.single_blocks:
            x = blk(x, vec)
        return self.final_layer(x[:, cond.shape[1]:], vec)


# ---------------------------------------------------------------------------
# ShapeVAE
# ---------------------------------------------------------------------------
class TorchVAESelfBlock(nn.Module):
    def __init__(self, w, heads, qkv_bias=False):
        super().__init__()
        self.heads = heads
        self.ln_1 = nn.LayerNorm(w, eps=1e-6)
        self.ln_2 = nn.LayerNorm(w, eps=1e-6)

        class Inner(nn.Module):
            def __init__(self):
                super().__init__()
                self.q_norm = nn.LayerNorm(w // heads, eps=1e-6)
                self.k_norm = nn.LayerNorm(w // heads, eps=1e-6)

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.c_qkv = nn.Linear(w, 3 * w, bias=qkv_bias)
                self.c_proj = nn.Linear(w, w)
                self.attention = Inner()

        class MLP(nn.Module):
            def __init__(self):
                super().__init__()
                self.c_fc = nn.Linear(w, 4 * w)
                self.c_proj = nn.Linear(4 * w, w)

        self.attn = Attn()
        self.mlp = MLP()

    def forward(self, x):
        h = self.ln_1(x)
        qkv = self.attn.c_qkv(h)
        b, l, w3 = qkv.shape
        heads = self.heads
        qkv = qkv.view(b, l, heads, -1)
        q, k, v = torch.split(qkv, w3 // (3 * heads), dim=-1)
        q = self.attn.attention.q_norm(q)
        k = self.attn.attention.k_norm(k)
        q, k, v = (z.permute(0, 2, 1, 3) for z in (q, k, v))
        out = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, l, -1)
        x = x + self.attn.c_proj(out)
        h = self.ln_2(x)
        return x + self.mlp.c_proj(F.gelu(self.mlp.c_fc(h)))


class TorchShapeVAE(nn.Module):
    """post_kl + transformer + geo_decoder with reference state-dict naming."""

    def __init__(self, embed_dim=8, w=32, heads=2, layers=2, num_freqs=8,
                 scale_factor=1.0188137142395404):
        super().__init__()
        self.scale_factor = scale_factor
        self.num_freqs = num_freqs
        self.heads = heads
        self.post_kl = nn.Linear(embed_dim, w)

        class Transformer(nn.Module):
            def __init__(self):
                super().__init__()
                self.resblocks = nn.ModuleList(
                    [TorchVAESelfBlock(w, heads) for _ in range(layers)])

        self.transformer = Transformer()

        qdim = 3 * (2 * num_freqs + 1)

        class Inner(nn.Module):
            def __init__(self):
                super().__init__()
                self.q_norm = nn.LayerNorm(w // heads, eps=1e-6)
                self.k_norm = nn.LayerNorm(w // heads, eps=1e-6)

        class CrossAttn(nn.Module):
            def __init__(self):
                super().__init__()
                self.c_q = nn.Linear(w, w, bias=False)
                self.c_kv = nn.Linear(w, 2 * w, bias=False)
                self.c_proj = nn.Linear(w, w)
                self.attention = Inner()

        class MLP(nn.Module):
            def __init__(self):
                super().__init__()
                self.c_fc = nn.Linear(w, 4 * w)
                self.c_proj = nn.Linear(4 * w, w)

        class CrossBlock(nn.Module):
            def __init__(self):
                super().__init__()
                self.attn = CrossAttn()
                self.ln_1 = nn.LayerNorm(w, eps=1e-6)
                self.ln_2 = nn.LayerNorm(w, eps=1e-6)
                self.ln_3 = nn.LayerNorm(w, eps=1e-6)
                self.mlp = MLP()

        class GeoDecoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.query_proj = nn.Linear(qdim, w)
                self.cross_attn_decoder = CrossBlock()
                self.ln_post = nn.LayerNorm(w)
                self.output_proj = nn.Linear(w, 1)

        self.geo_decoder = GeoDecoder()

    def fourier(self, x):
        freqs = 2.0 ** torch.arange(self.num_freqs, dtype=torch.float32)
        e = (x[..., None] * freqs).reshape(*x.shape[:-1], -1)
        return torch.cat([x, e.sin(), e.cos()], dim=-1)

    def forward(self, latents, queries):
        latents = latents / self.scale_factor
        x = self.post_kl(latents)
        for blk in self.transformer.resblocks:
            x = blk(x)
        g = self.geo_decoder
        qe = g.query_proj(self.fourier(queries))
        h = g.cross_attn_decoder.ln_1(qe)
        data = g.cross_attn_decoder.ln_2(x)
        q = g.cross_attn_decoder.attn.c_q(h)
        kv = g.cross_attn_decoder.attn.c_kv(data)
        b, nq, w = q.shape
        _, nk, _ = kv.shape
        heads = self.heads
        d = w // heads
        q = g.cross_attn_decoder.attn.attention.q_norm(q.view(b, nq, heads, d))
        k, v = torch.split(kv.view(b, nk, heads, 2 * d), d, dim=-1)
        k = g.cross_attn_decoder.attn.attention.k_norm(k)
        q, k, v = (z.permute(0, 2, 1, 3) for z in (q, k, v))
        out = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, nq, -1)
        xq = qe + g.cross_attn_decoder.attn.c_proj(out)
        h = g.cross_attn_decoder.ln_3(xq)
        xq = xq + g.cross_attn_decoder.mlp.c_proj(F.gelu(g.cross_attn_decoder.mlp.c_fc(h)))
        return g.output_proj(g.ln_post(xq))


# ---------------------------------------------------------------------------
# DINOv2
# ---------------------------------------------------------------------------
class TorchDinoLayer(nn.Module):
    def __init__(self, h, heads, swiglu_hidden):
        super().__init__()
        self.heads = heads
        self.norm1 = nn.LayerNorm(h, eps=1e-6)
        self.norm2 = nn.LayerNorm(h, eps=1e-6)

        class SelfAttn(nn.Module):
            def __init__(self):
                super().__init__()
                self.query = nn.Linear(h, h)
                self.key = nn.Linear(h, h)
                self.value = nn.Linear(h, h)

        class AttnOut(nn.Module):
            def __init__(self):
                super().__init__()
                self.dense = nn.Linear(h, h)

        class Attention(nn.Module):
            def __init__(self):
                super().__init__()
                self.attention = SelfAttn()
                self.output = AttnOut()

        class LayerScale(nn.Module):
            def __init__(self):
                super().__init__()
                self.lambda1 = nn.Parameter(torch.randn(h))

        class SwiGLU(nn.Module):
            def __init__(self):
                super().__init__()
                self.weights_in = nn.Linear(h, 2 * swiglu_hidden)
                self.weights_out = nn.Linear(swiglu_hidden, h)

        self.attention = Attention()
        self.layer_scale1 = LayerScale()
        self.layer_scale2 = LayerScale()
        self.mlp = SwiGLU()

    def forward(self, x):
        h = self.norm1(x)
        b, l, w = h.shape
        hd = w // self.heads

        def heads_of(z):
            return z.view(b, l, self.heads, hd).permute(0, 2, 1, 3)

        q = heads_of(self.attention.attention.query(h))
        k = heads_of(self.attention.attention.key(h))
        v = heads_of(self.attention.attention.value(h))
        o = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, l, w)
        x = x + self.attention.output.dense(o) * self.layer_scale1.lambda1
        hh = self.norm2(x)
        x1, x2 = self.mlp.weights_in(hh).chunk(2, dim=-1)
        return x + self.mlp.weights_out(F.silu(x1) * x2) * self.layer_scale2.lambda1


class TorchDino(nn.Module):
    def __init__(self, h=48, heads=4, layers=2, patch=14, image=56, swiglu_hidden=64):
        super().__init__()
        np_ = (image // patch) ** 2

        class PatchEmbeddings(nn.Module):
            def __init__(self):
                super().__init__()
                self.projection = nn.Conv2d(3, h, kernel_size=patch, stride=patch)

        class Embeddings(nn.Module):
            def __init__(self):
                super().__init__()
                self.cls_token = nn.Parameter(torch.randn(1, 1, h))
                self.position_embeddings = nn.Parameter(torch.randn(1, np_ + 1, h))
                self.patch_embeddings = PatchEmbeddings()

        class Encoder(nn.Module):
            def __init__(self):
                super().__init__()
                self.layer = nn.ModuleList(
                    [TorchDinoLayer(h, heads, swiglu_hidden) for _ in range(layers)])

        self.embeddings = Embeddings()
        self.encoder = Encoder()
        self.layernorm = nn.LayerNorm(h, eps=1e-6)

    def forward(self, pixel_values_nchw):
        e = self.embeddings.patch_embeddings.projection(pixel_values_nchw)
        e = e.flatten(2).transpose(1, 2)
        b = e.shape[0]
        cls = self.embeddings.cls_token.expand(b, -1, -1)
        x = torch.cat([cls, e], dim=1) + self.embeddings.position_embeddings
        for lyr in self.encoder.layer:
            x = lyr(x)
        return self.layernorm(x)
