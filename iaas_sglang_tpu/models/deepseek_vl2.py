"""DeepSeek-VL2 (reference: srt/models/deepseek_vl2.py
DeepseekVL2ForCausalLM + srt/configs/deepseekvl2.py).

Composition: timm-layout SigLIP tower ('vision.*' keys, the so400m family
instantiated via timm in the reference, deepseek_vl2.py:199) feeding the
'downsample_mlp_gelu' projector (channel-major 2x2 unfold after zero-pad,
Linear/GELU stack, deepseek_vl2.py:71,128), then the 2D tile-tag layout
(deepseek_vl2.py:283-356): per view an `image_newline` row appended to
every grid row, global view and local view joined by `view_seperator`.
LM is the DeepSeek MLA family under the 'language.' prefix
(deepseek_vl2.py:268 load_weights strips 'language.').

Serving uses one fixed square tile (grid*patch pixels, e.g. 378 for the
so400m tower) = the (1,1) crop: the global view and the single local tile
are the same resized image, so the tower runs once per image and the rows
are laid out global;separator;local (global_view_pos='head'). The
reference's adaptive candidate_resolutions tiling is preprocessing-side.
use_mla=False configs (deepseek-vl2-tiny) are rejected — the MHA+MoE
hybrid LM is not wired.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.deepseek_family import DeepseekFamilyForCausalLM
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.models.vision import (TimmVitConfig, clip_patchify,
                                            timm_vit_encode, timm_vit_specs)

_VT_PREFIX = "vision.|model.vision."
_PJ = "projector.|model.projector."


class DeepseekVL2ForCausalLM:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = DeepseekFamilyForCausalLM(config)
        hf = config.hf_config
        vcd = config.vision_config or {}
        name = vcd.get("model_name", "siglip_so400m_patch14_384")
        # serve at grid*patch (378 for so400m/14): the trained pos_embed
        # grid, no dynamic padding
        img = vcd.get("image_size", 384)
        p = vcd.get("patch_size", 14)
        self.vc = TimmVitConfig(name, image_size=(img // p) * p,
                                overrides=vcd)
        pc = hf.get("projector_config") or {}
        if pc.get("projector_type", "downsample_mlp_gelu") \
                != "downsample_mlp_gelu":
            raise ValueError("only downsample_mlp_gelu projector supported")
        self.pj_depth = pc.get("depth", 2)
        self.pj_ratio = pc.get("mlp_ratio", 1)
        self.pj_ds = pc.get("downsample_ratio", 2)
        self.n_embed = pc.get("n_embed", config.hidden_size)
        self.global_view_pos = hf.get("global_view_pos", "head")
        if hf.get("tile_tag", "2D") != "2D":
            raise ValueError("only tile_tag='2D' supported")
        self.hp = -(-self.vc.grid // self.pj_ds)   # projected grid side

    @property
    def mesh(self):
        return self.lm.mesh

    @mesh.setter
    def mesh(self, v):
        self.lm.mesh = v

    @property
    def moe_impl(self):
        return self.lm.moe_impl

    @moe_impl.setter
    def moe_impl(self, v):
        self.lm.moe_impl = v

    def kv_entry_shape(self):
        return self.lm.kv_entry_shape()

    def kv_shard_dims(self):
        return self.lm.kv_shard_dims()

    def num_image_tokens(self) -> int:
        per_view = self.hp * (self.hp + 1)         # + newline per row
        return 2 * per_view + 1                    # global + sep + local

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                key = "|".join("language." + alt for alt in key.split("|"))
            s[name] = dataclasses.replace(spec, hf_key=key)

        s.update(timm_vit_specs(self.vc, _VT_PREFIX))

        C = self.vc.hidden_size
        ne, r, ds = self.n_embed, self.pj_ratio, self.pj_ds

        def pk(suffix):
            return "|".join(pref + suffix for pref in _PJ.split("|"))

        # linears sit at even indices of the Linear/GELU stack
        dims = [(C * ds * ds, ne * r)]
        dims += [(ne * r, ne * r)] * (self.pj_depth - 2)
        dims += [(ne * r, ne)]
        for i, (din, dout) in enumerate(dims):
            s[f"pj.l{i}_w"] = WeightSpec(
                (din, dout), (None, None),
                pk(f"layers.{2 * i}.weight"), transpose=True)
            s[f"pj.l{i}_b"] = WeightSpec(
                (dout,), (None,), pk(f"layers.{2 * i}.bias"))
        s["pj.newline"] = WeightSpec(
            (ne,), (None,), "image_newline|model.image_newline")
        s["pj.separator"] = WeightSpec(
            (ne,), (None,), "view_seperator|model.view_seperator")
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> tile-tagged LM rows
        [N, 2*hp*(hp+1)+1, n_embed]."""
        vc = self.vc
        N = patches.shape[0]
        g, ds, hp = vc.grid, self.pj_ds, self.hp
        C = vc.hidden_size

        feats = timm_vit_encode(params, patches, vc)        # [N, g*g, C]
        # downsample_mlp_gelu: zero-pad grid to a ds multiple, channel-major
        # ds x ds unfold (F.unfold layout: c slowest, then ki, kj)
        x = feats.reshape(N, g, g, C)
        pad = hp * ds - g
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        x = x.reshape(N, hp, ds, hp, ds, C).transpose(0, 1, 3, 5, 2, 4)
        x = x.reshape(N, hp * hp, C * ds * ds).astype(jnp.float32)
        pj = params["pj"]
        n_lin = self.pj_depth
        for i in range(n_lin):
            x = x @ pj[f"l{i}_w"].astype(jnp.float32) + pj[f"l{i}_b"]
            if i < n_lin - 1:
                x = jax.nn.gelu(x, approximate=False)
        D = x.shape[-1]

        # 2D tile tag: newline row per grid row, global ; separator ; local
        # (the single local tile IS the global view under (1,1) crops)
        view = x.reshape(N, hp, hp, D)
        nl = jnp.broadcast_to(pj["newline"].astype(jnp.float32)[None, None,
                                                                None],
                              (N, hp, 1, D))
        view = jnp.concatenate([view, nl], axis=2).reshape(N, -1, D)
        sep = jnp.broadcast_to(pj["separator"].astype(jnp.float32)[None,
                                                                   None],
                               (N, 1, D))
        # global_view_pos head/tail lay out the same rows here because the
        # (1,1)-crop local tile IS the global view
        out = jnp.concatenate([view, sep, view], axis=1)
        return out.astype(pj["l0_w"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
