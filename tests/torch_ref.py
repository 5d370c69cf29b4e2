"""Torch oracle models for numerical parity tests.

These are eval-mode PyTorch models whose state-dict key layout matches the
reference framework's checkpoints (architectures documented in SURVEY.md §2;
reference files `src/models/{temporal,audio,video,fusion}.py`).  They exist so
tests can (a) generate reference-format state dicts and (b) produce oracle
outputs to compare the Flax/TPU implementation against.  Built on torch
built-ins only (no torchvision / torchaudio, which are not installed).
"""

from __future__ import annotations

import math

import torch
from torch import nn


# --------------------------------------------------------------------------
# temporal pooling (src/models/temporal.py)
# --------------------------------------------------------------------------


class RefAttnPool(nn.Module):
    def __init__(self, dim: int, dropout: float = 0.1):
        super().__init__()
        hidden = max(1, dim // 2)
        self.score = nn.Sequential(
            nn.LayerNorm(dim),
            nn.Linear(dim, hidden),
            nn.GELU(),
            nn.Dropout(dropout),
            nn.Linear(hidden, 1),
        )

    def forward(self, x):
        attn = torch.softmax(self.score(x).squeeze(-1), dim=1).unsqueeze(-1)
        return (x * attn).sum(dim=1)


class RefTransformerPool(nn.Module):
    def __init__(self, dim, num_heads=4, num_layers=1, dropout=0.1, mlp_ratio=4.0):
        super().__init__()
        ffn = max(dim * 2, int(dim * mlp_ratio))
        layer = nn.TransformerEncoderLayer(
            d_model=dim,
            nhead=num_heads,
            dim_feedforward=ffn,
            dropout=dropout,
            activation="gelu",
            batch_first=True,
            norm_first=True,
        )
        self.encoder = nn.TransformerEncoder(layer, num_layers=num_layers)
        self.pool = RefAttnPool(dim, dropout)
        self.dim = dim

    def _pe(self, t: int) -> torch.Tensor:
        pos = torch.arange(t).unsqueeze(1).double()
        div = torch.exp(
            torch.arange(0, self.dim, 2).double() * (-math.log(10000.0) / max(1, self.dim))
        )
        pe = torch.zeros(t, self.dim, dtype=torch.float64)
        pe[:, 0::2] = torch.sin(pos * div)
        if self.dim > 1:
            pe[:, 1::2] = torch.cos(pos * div[: pe[:, 1::2].shape[1]])
        return pe.float()

    def forward(self, x):
        x = x + self._pe(x.size(1)).unsqueeze(0)
        return self.pool(self.encoder(x))


class RefTemporalPooler(nn.Module):
    def __init__(self, dim, mode="mean", num_heads=4, num_layers=1, dropout=0.1):
        super().__init__()
        self.mode = mode
        if mode == "mean":
            self.pool = None
        elif mode == "attn":
            self.pool = RefAttnPool(dim, dropout)
        else:
            self.pool = RefTransformerPool(dim, num_heads, num_layers, dropout)

    def forward(self, x):
        return x.mean(dim=1) if self.pool is None else self.pool(x)


# --------------------------------------------------------------------------
# audio encoders (src/models/audio.py)
# --------------------------------------------------------------------------


class RefAudioCNN(nn.Module):
    def __init__(self, embedding_dim=128, temporal_bins=16):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(1, 16, 3, padding=1),
            nn.BatchNorm2d(16),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(2),
            nn.Conv2d(16, 32, 3, padding=1),
            nn.BatchNorm2d(32),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(2),
            nn.Conv2d(32, 64, 3, padding=1),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
        )
        self.proj = nn.Sequential(nn.Linear(64, embedding_dim), nn.ReLU(inplace=True))
        self.sequence_pool = nn.AdaptiveAvgPool2d((1, temporal_bins))
        self.embedding_dim = embedding_dim

    def forward_sequence(self, x):
        x = self.features(x)
        x = self.sequence_pool(x).squeeze(2).transpose(1, 2).contiguous()
        return self.proj(x)

    def forward(self, x):
        return self.forward_sequence(x).mean(dim=1)


def _plain_block(ch: int) -> nn.Sequential:
    # NB: deliberately NO residual connection (reference quirk,
    # src/models/audio.py:93-100).
    return nn.Sequential(
        nn.Conv2d(ch, ch, 3, padding=1, bias=False),
        nn.BatchNorm2d(ch),
        nn.ReLU(inplace=True),
        nn.Conv2d(ch, ch, 3, padding=1, bias=False),
        nn.BatchNorm2d(ch),
    )


class RefAudioResNet18(nn.Module):
    def __init__(self, embedding_dim=128, temporal_bins=16):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.conv1 = nn.Conv2d(1, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        def layer(cin, cout, stride):
            mods = []
            if stride != 1 or cin != cout:
                mods.append(
                    nn.Sequential(
                        nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                        nn.BatchNorm2d(cout),
                    )
                )
            mods += [_plain_block(cout), _plain_block(cout)]
            return nn.Sequential(*mods)

        self.layer1 = layer(64, 64, 1)
        self.layer2 = layer(64, 128, 2)
        self.layer3 = layer(128, 256, 2)
        self.layer4 = layer(256, 512, 2)
        self.sequence_pool = nn.AdaptiveAvgPool2d((1, temporal_bins))
        self.fc = nn.Linear(512, embedding_dim)

    def forward_sequence(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = self.sequence_pool(x).squeeze(2).transpose(1, 2).contiguous()
        return self.fc(x)

    def forward(self, x):
        return self.forward_sequence(x).mean(dim=1)


class RefAudioNet(nn.Module):
    def __init__(self, num_classes, embedding_dim=128, use_resnet=True, **pool_kwargs):
        super().__init__()
        self.embedding_dim = embedding_dim
        self.sequence_dim = embedding_dim
        self.encoder = (
            RefAudioResNet18(embedding_dim) if use_resnet else RefAudioCNN(embedding_dim)
        )
        self.temporal_pool = RefTemporalPooler(embedding_dim, **pool_kwargs)
        self.classifier = nn.Linear(embedding_dim, num_classes)

    def encode_sequence(self, x):
        return self.encoder.forward_sequence(x)

    def encode(self, x):
        return self.temporal_pool(self.encode_sequence(x))

    def forward(self, x):
        return self.classifier(self.encode(x))


# --------------------------------------------------------------------------
# video encoder (src/models/video.py; torchvision resnet18 layout)
# --------------------------------------------------------------------------


class ResBlock(nn.Module):
    """torchvision BasicBlock (state-dict names conv1/bn1/conv2/bn2/downsample)."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.bn2(self.conv2(self.relu(self.bn1(self.conv1(x)))))
        return self.relu(out + idt)


def make_resnet18_backbone() -> nn.Sequential:
    """resnet18 children[:-1] as an nn.Sequential (keys backbone.0 .. .8)."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
        nn.BatchNorm2d(64),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(3, stride=2, padding=1),
        nn.Sequential(ResBlock(64, 64), ResBlock(64, 64)),
        nn.Sequential(ResBlock(64, 128, 2), ResBlock(128, 128)),
        nn.Sequential(ResBlock(128, 256, 2), ResBlock(256, 256)),
        nn.Sequential(ResBlock(256, 512, 2), ResBlock(512, 512)),
        nn.AdaptiveAvgPool2d(1),
    )


class RefVideoNet(nn.Module):
    def __init__(self, num_classes, **pool_kwargs):
        super().__init__()
        self.backbone = make_resnet18_backbone()
        self.embedding_dim = 512
        self.temporal_pool = RefTemporalPooler(512, **pool_kwargs)
        self.classifier = nn.Linear(512, num_classes)

    def encode(self, x):
        b, t, c, h, w = x.shape
        feat = self.backbone(x.view(b * t, c, h, w)).view(b, t, 512)
        return self.temporal_pool(feat)

    def forward(self, x):
        return self.classifier(self.encode(x))


# --------------------------------------------------------------------------
# fusion (src/models/fusion.py)
# --------------------------------------------------------------------------


class RefClipAlign(nn.Module):
    def __init__(self, audio_dim, video_dim, align_dim, init_temperature=0.07):
        super().__init__()
        self.audio_proj = nn.Linear(audio_dim, align_dim)
        self.video_proj = nn.Linear(video_dim, align_dim)
        self.logit_scale = nn.Parameter(
            torch.tensor(math.log(1.0 / max(init_temperature, 1e-3)))
        )

    def forward(self, a, v):
        aa, vv = self.audio_proj(a), self.video_proj(v)
        an = nn.functional.normalize(aa, dim=-1)
        vn = nn.functional.normalize(vv, dim=-1)
        scale = self.logit_scale.exp().clamp(max=100.0)
        logits = scale * (an @ vn.t())
        tgt = torch.arange(logits.size(0))
        loss = 0.5 * (
            nn.functional.cross_entropy(logits, tgt)
            + nn.functional.cross_entropy(logits.t(), tgt)
        )
        return aa, vv, loss


class RefEmotionPrior(nn.Module):
    def __init__(self, token_dim, prior_dim, hidden_dim, dropout=0.1):
        super().__init__()
        self.prior_net = nn.Sequential(
            nn.Linear(token_dim * 2, hidden_dim),
            nn.ReLU(inplace=True),
            nn.Dropout(dropout),
            nn.Linear(hidden_dim, prior_dim),
        )
        self.v_query_bias = nn.Linear(token_dim + prior_dim, 1)
        self.a_key_bias = nn.Linear(token_dim + prior_dim, 1)
        self.a_query_bias = nn.Linear(token_dim + prior_dim, 1)
        self.v_key_bias = nn.Linear(token_dim + prior_dim, 1)
        self.bias_scale = nn.Parameter(torch.tensor(1.0))

    def _bias(self, q, k, prior, qh, kh):
        qp = prior.unsqueeze(1).expand(-1, q.size(1), -1)
        kp = prior.unsqueeze(1).expand(-1, k.size(1), -1)
        qs = qh(torch.cat([q, qp], dim=-1)).squeeze(-1)
        ks = kh(torch.cat([k, kp], dim=-1)).squeeze(-1)
        return torch.tanh(qs.unsqueeze(-1) + ks.unsqueeze(-2)) * self.bias_scale

    def forward(self, v_tokens, a_tokens):
        prior = self.prior_net(
            torch.cat([v_tokens.mean(1), a_tokens.mean(1)], dim=-1)
        )
        v2a = self._bias(v_tokens, a_tokens, prior, self.v_query_bias, self.a_key_bias)
        a2v = self._bias(a_tokens, v_tokens, prior, self.a_query_bias, self.v_key_bias)
        return prior, v2a, a2v


class RefFusionModel(nn.Module):
    def __init__(
        self,
        audio_model,
        video_model,
        num_classes,
        mode="late",
        common_dim=256,
        xattn_head="concat",
        d_model=128,
        num_heads=4,
        audio_n_mels=64,
        temporal_pooling="mean",
        fusion_align_mode="none",
        fusion_align_dim=256,
        use_emotion_prior=False,
        prior_dim=8,
        prior_hidden=64,
    ):
        super().__init__()
        self.audio_model = audio_model
        self.video_model = video_model
        self.mode = mode
        self.num_heads = num_heads
        self.d_model = d_model
        self.xattn_head = xattn_head
        self.alignment_loss = None
        self.semantic_alignment = None

        if mode in {"concat", "gated"}:
            a_dim, v_dim = audio_model.embedding_dim, video_model.embedding_dim
            if fusion_align_mode == "clip":
                self.semantic_alignment = RefClipAlign(a_dim, v_dim, fusion_align_dim)
                a_dim = v_dim = fusion_align_dim
            self.audio_proj = nn.Linear(a_dim, common_dim)
            self.video_proj = nn.Linear(v_dim, common_dim)
            if mode == "concat":
                self.fusion = nn.Sequential(
                    nn.Linear(common_dim * 2, common_dim),
                    nn.ReLU(inplace=True),
                    nn.Dropout(0.2),
                    nn.Linear(common_dim, num_classes),
                )
            else:
                self.gate = nn.Sequential(
                    nn.Linear(common_dim * 2, common_dim),
                    nn.ReLU(inplace=True),
                    nn.Dropout(0.2),
                    nn.Linear(common_dim, 1),
                    nn.Sigmoid(),
                )
                self.classifier = nn.Linear(common_dim, num_classes)

        if mode == "xattn":
            self.v_dim = video_model.embedding_dim
            seq_dim = getattr(audio_model, "sequence_dim", d_model)
            self.v_in_proj = nn.Linear(self.v_dim, d_model)
            self.a_in_proj = nn.Linear(d_model, d_model)
            self.audio_time_conv = nn.Conv1d(audio_n_mels, d_model, 3, padding=1)
            self.audio_seq_proj = nn.Linear(seq_dim, d_model)
            self.v2a_attn = nn.MultiheadAttention(d_model, num_heads, batch_first=True)
            self.a2v_attn = nn.MultiheadAttention(d_model, num_heads, batch_first=True)
            self.v_norm = nn.LayerNorm(d_model)
            self.a_norm = nn.LayerNorm(d_model)
            self.emotion_prior_bias = (
                RefEmotionPrior(d_model, prior_dim, prior_hidden)
                if use_emotion_prior
                else None
            )
            self.v_temporal_pool = RefTemporalPooler(d_model, mode=temporal_pooling)
            self.a_temporal_pool = RefTemporalPooler(d_model, mode=temporal_pooling)
            if xattn_head == "concat":
                self.xattn_mlp = nn.Sequential(
                    nn.Linear(d_model * 2, common_dim),
                    nn.ReLU(inplace=True),
                    nn.Dropout(0.2),
                    nn.Linear(common_dim, num_classes),
                )
            else:
                self.xattn_gate = nn.Sequential(
                    nn.Linear(d_model * 2, d_model),
                    nn.ReLU(inplace=True),
                    nn.Dropout(0.2),
                    nn.Linear(d_model, 1),
                    nn.Sigmoid(),
                )
                self.xattn_classifier = nn.Linear(d_model, num_classes)

    def _expand_bias(self, bias):
        return None if bias is None else bias.repeat_interleave(self.num_heads, dim=0)

    def forward(self, video, audio):
        self.alignment_loss = None
        if self.mode == "late":
            return 0.5 * (
                torch.softmax(self.audio_model(audio), dim=1)
                + torch.softmax(self.video_model(video), dim=1)
            )
        if self.mode == "xattn":
            b, t, c, h, w = video.shape
            v_feat = self.video_model.backbone(video.view(b * t, c, h, w)).view(
                b, t, self.v_dim
            )
            v = self.v_in_proj(v_feat)
            a_seq = self.audio_seq_proj(self.audio_model.encode_sequence(audio))
            a = self.a_in_proj(a_seq)
            v2a_bias = a2v_bias = None
            if self.emotion_prior_bias is not None:
                _, v2a_bias, a2v_bias = self.emotion_prior_bias(v, a)
            v2, _ = self.v2a_attn(v, a, a, attn_mask=self._expand_bias(v2a_bias))
            v = self.v_norm(v + v2)
            a2, _ = self.a2v_attn(a, v, v, attn_mask=self._expand_bias(a2v_bias))
            a = self.a_norm(a + a2)
            v_emb = self.v_temporal_pool(v)
            a_emb = self.a_temporal_pool(a)
            if self.xattn_head == "concat":
                return self.xattn_mlp(torch.cat([v_emb, a_emb], dim=1))
            g = self.xattn_gate(torch.cat([v_emb, a_emb], dim=1))
            return self.xattn_classifier(g * v_emb + (1 - g) * a_emb)

        a_emb = self.audio_model.encode(audio)
        v_emb = self.video_model.encode(video)
        if self.semantic_alignment is not None:
            a_emb, v_emb, self.alignment_loss = self.semantic_alignment(a_emb, v_emb)
        a_emb = self.audio_proj(a_emb)
        v_emb = self.video_proj(v_emb)
        if self.mode == "concat":
            return self.fusion(torch.cat([a_emb, v_emb], dim=1))
        g = self.gate(torch.cat([a_emb, v_emb], dim=1))
        return self.classifier(g * a_emb + (1 - g) * v_emb)
