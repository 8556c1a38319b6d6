"""Measured-proxy baseline (BASELINE.md): eager PyTorch-CPU WGAN-GP step.

The reference repo cannot be executed here (mount empty, no GPU), so the
"reference steps/sec" denominator for the >=8x target [B:5] is this
straightforward eager torch implementation of the IDENTICAL math as the
flagship wgan_gp_b64 config: WaveGAN G/D (kernel 25, stride 4, dims 64..1024),
phase shuffle, WGAN-GP with create_graph=True double-backprop, Adam(1e-4,
(0.5, 0.9)), n_critic=5, batch 64, 16384-sample clips. This is our own
implementation — nothing is copied from the (empty) reference.

Run: python -m bench.proxy_torch [--steps 3] [--batch 64]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


class G(nn.Module):
    def __init__(self, d=64, latent=100, max_ch=1024):
        super().__init__()
        chs = [min(d * 2 ** (4 - i), max_ch) for i in range(4)] + [1]
        c0 = min(d * 16, max_ch)
        self.fc = nn.Linear(latent, 16 * c0)
        self.c0 = c0
        convs = []
        cin = c0
        for c in chs:
            convs.append(nn.ConvTranspose1d(cin, c, 25, stride=4,
                                            padding=12, output_padding=3))
            cin = c
        self.convs = nn.ModuleList(convs)

    def forward(self, z):
        h = F.relu(self.fc(z)).view(z.shape[0], self.c0, 16)
        for i, c in enumerate(self.convs):
            h = c(h)
            h = torch.tanh(h) if i == len(self.convs) - 1 else F.relu(h)
        return h


class D(nn.Module):
    def __init__(self, d=64, max_ch=1024, shuffle=2):
        super().__init__()
        chs = [min(d * 2 ** i, max_ch) for i in range(5)]
        convs, cin = [], 1
        for c in chs:
            convs.append(nn.Conv1d(cin, c, 25, stride=4, padding=12))
            cin = c
        self.convs = nn.ModuleList(convs)
        self.fc = nn.Linear(chs[-1] * 16, 1)
        self.shuffle = shuffle

    def forward(self, x):
        h = x
        for i, c in enumerate(self.convs):
            h = F.leaky_relu(c(h), 0.2)
            if self.shuffle and i < len(self.convs) - 1:
                h = phase_shuffle(h, self.shuffle)
        return self.fc(h.flatten(1))[:, 0]


def phase_shuffle(h, n):
    """Per-example reflect-padded random shift (same semantics as
    audiogan_tpu/ops/phase_shuffle.py — WaveGAN's regularizer), replacing
    an earlier torch.roll stand-in that under-counted the proxy's work."""
    b, _, t = h.shape
    shifts = torch.randint(-n, n + 1, (b,))
    hp = F.pad(h, (n, n), mode="reflect")
    idx = (torch.arange(t)[None, :] + n + shifts[:, None])
    return torch.gather(hp, 2, idx[:, None, :].expand(-1, h.shape[1], -1))


def train_steps(n_steps=3, batch=64, n_critic=5, clip=16384, d=64):
    torch.manual_seed(0)
    g, dnet = G(d), D(d)
    opt_g = torch.optim.Adam(g.parameters(), 1e-4, betas=(0.5, 0.9))
    opt_d = torch.optim.Adam(dnet.parameters(), 1e-4, betas=(0.5, 0.9))
    times = []
    for s in range(n_steps):
        t0 = time.time()
        for _ in range(n_critic):
            real = torch.rand(batch, 1, clip) * 2 - 1
            z = torch.randn(batch, 100)
            with torch.no_grad():
                fake = g(z)
            eps = torch.rand(batch, 1, 1)
            xhat = (eps * real + (1 - eps) * fake).requires_grad_(True)
            d_loss = dnet(fake).mean() - dnet(real).mean()
            grad = torch.autograd.grad(dnet(xhat).sum(), xhat,
                                       create_graph=True)[0]
            gp = ((grad.flatten(1).norm(dim=1) - 1) ** 2).mean()
            loss = d_loss + 10.0 * gp
            opt_d.zero_grad(); loss.backward(); opt_d.step()
        z = torch.randn(batch, 100)
        g_loss = -dnet(g(z)).mean()
        opt_g.zero_grad(); g_loss.backward(); opt_g.step()
        times.append(time.time() - t0)
        print(f"proxy step {s}: {times[-1]:.2f}s", flush=True)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    times = train_steps(n_steps=args.steps, batch=args.batch)
    best = min(times)
    print(json.dumps({"proxy": "torch-cpu-eager",
                      "steps_per_sec": round(1.0 / best, 5),
                      "sec_per_step": round(best, 3),
                      "batch": args.batch}))


if __name__ == "__main__":
    main()
