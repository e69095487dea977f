"""PyTorch oracle for CLIP parity tests.

A from-scratch torch implementation of the OpenAI CLIP ViT-B/32
architecture (fp32, CPU), used ONLY as a numerical reference. The masked
attention-pool forward replicates the hook semantics of the reference
(``/root/reference/oadp/oake/objects.py:198-266``) in straight-line code.
State-dict keys follow OpenAI CLIP so the production converter
(`oadp_tpu.models.clip.convert_torch_state_dict`) can consume them.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class QuickGELU(nn.Module):

    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):

    def __init__(self, width: int, heads: int):
        super().__init__()
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_1 = nn.LayerNorm(width)
        self.mlp = nn.Sequential()
        self.mlp.add_module('c_fc', nn.Linear(width, width * 4))
        self.mlp.add_module('gelu', QuickGELU())
        self.mlp.add_module('c_proj', nn.Linear(width * 4, width))
        self.ln_2 = nn.LayerNorm(width)

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        x = x + y
        x = x + self.mlp(self.ln_2(x))
        return x


class Transformer(nn.Module):

    def __init__(self, width: int, layers: int, heads: int):
        super().__init__()
        self.resblocks = nn.ModuleList(
            ResidualAttentionBlock(width, heads) for _ in range(layers)
        )

    def forward(self, x, attn_mask=None):
        for block in self.resblocks:
            x = block(x, attn_mask)
        return x


class VisionTransformer(nn.Module):

    def __init__(
        self,
        input_resolution: int = 224,
        patch_size: int = 32,
        width: int = 768,
        layers: int = 12,
        heads: int = 12,
        output_dim: int = 512,
    ):
        super().__init__()
        self.patch_size = patch_size
        self.heads = heads
        self.conv1 = nn.Conv2d(3, width, patch_size, patch_size, bias=False)
        scale = width**-0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        grid = input_resolution // patch_size
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(grid * grid + 1, width)
        )
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, output_dim))

    def _tokens(self, x):
        x = self.conv1(x)  # (B, D, g, g)
        x = x.flatten(2).permute(0, 2, 1)  # (B, g*g, D)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        return self.ln_pre(x)

    def forward(self, x):
        x = self._tokens(x)
        x = x.permute(1, 0, 2)  # LND
        x = self.transformer(x)
        x = x.permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj

    def masked_forward(self, x, masks):
        """Replicates the reference's hook-based dual stream
        (objects.py:198-266): main stream evolves unmasked; side CLS
        stream attends over [patches, y] with additive mask * -100."""
        B = x.shape[0]
        attn_mask = masks.flatten(1)  # (B, n_patches)
        attn_mask = torch.cat(
            [attn_mask, attn_mask.new_zeros(B, 1)], dim=-1
        ) * -100.0
        attn_mask = attn_mask[:, None, None, :].expand(
            B, self.heads, 1, attn_mask.shape[-1]
        ).reshape(B * self.heads, 1, -1)

        x = self._tokens(x).permute(1, 0, 2)  # LND
        y = x[[0]]
        for block in self.transformer.resblocks:
            kv = block.ln_1(torch.cat([x[1:], y]))
            y = y + block.attn(
                kv[[-1]], kv, kv, need_weights=False, attn_mask=attn_mask
            )[0]
            y = y + block.mlp(block.ln_2(y))
            x = block(x)
        y = y.permute(1, 0, 2)
        return self.ln_post(y[:, 0]) @ self.proj


class TextTransformer(nn.Module):

    def __init__(
        self,
        context_length: int = 77,
        vocab_size: int = 49408,
        width: int = 512,
        layers: int = 12,
        heads: int = 8,
        output_dim: int = 512,
    ):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab_size, width)
        self.positional_embedding = nn.Parameter(
            0.01 * torch.randn(context_length, width)
        )
        self.transformer = Transformer(width, layers, heads)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(
            width**-0.5 * torch.randn(width, output_dim)
        )
        mask = torch.full((context_length, context_length), float('-inf'))
        self.register_buffer('attn_mask', mask.triu_(1), persistent=False)

    def forward(self, tokens):
        x = self.token_embedding(tokens)
        n = x.shape[1]
        x = x + self.positional_embedding[:n]
        x = x.permute(1, 0, 2)
        x = self.transformer(x, self.attn_mask[:n, :n])
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return x @ self.text_projection


def state_dict_openai_style(
    visual: VisionTransformer,
    text: TextTransformer | None = None,
    numpy: bool = True,
) -> dict:
    """Rename oracle parameters to the OpenAI CLIP state-dict layout."""
    state = {f'visual.{k}': v for k, v in visual.state_dict().items()}
    state['visual.proj'] = visual.proj.data
    state['visual.class_embedding'] = visual.class_embedding.data
    state['visual.positional_embedding'] = visual.positional_embedding.data
    if text is not None:
        for k, v in text.state_dict().items():
            state[k] = v
        state['text_projection'] = text.text_projection.data
        state['positional_embedding'] = text.positional_embedding.data
    state = {k: v for k, v in state.items() if 'attn_mask' not in k}
    if numpy:
        state = {k: v.numpy() for k, v in state.items()}
    return state
