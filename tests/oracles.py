"""Float64 reference oracles used by the parity tests.

These restate the REFERENCE EQUATIONS (cited per function) independently of
the aec_tpu implementation: numpy rfft-based STFT, pinv synthesis, and a
torch-backed LittleNet forward that consumes the same parameter arrays as the
aec_tpu pytree. They are the ground truth the TPU code must match.
"""

import numpy as np
import torch

from aec_tpu.dsp.windows import periodic_window


class OracleStft:
    """ConvSTFT/ConviSTFT equations (attention_ccrn.py:8-101) in numpy f64."""

    def __init__(self, win_len=512, hop=256, fft_len=512, win_type="hann"):
        self.win_len, self.hop, self.fft_len = win_len, hop, fft_len
        self.k = fft_len // 2 + 1
        self.window = periodic_window(win_type, win_len)
        dft = np.fft.rfft(np.eye(fft_len))[:win_len]
        basis = np.concatenate([dft.real, dft.imag], axis=1).T  # (2K, win)
        self.syn = np.linalg.pinv(basis).T * self.window  # (2K, win)

    def stft(self, x):
        """[B, n] -> [B, F, 2K]."""
        pad = self.win_len - self.hop
        xp = np.pad(np.asarray(x, np.float64), [(0, 0), (pad, pad)])
        n_frames = (xp.shape[-1] - self.win_len) // self.hop + 1
        out = np.zeros((x.shape[0], n_frames, 2 * self.k))
        for f in range(n_frames):
            seg = xp[:, f * self.hop : f * self.hop + self.win_len] * self.window
            spec = np.fft.rfft(seg, n=self.fft_len, axis=-1)
            out[:, f, : self.k] = spec.real
            out[:, f, self.k :] = spec.imag
        return out

    def istft(self, spec):
        """[B, F, 2K] -> [B, n] with envelope normalization + edge trim."""
        b, n_frames, _ = spec.shape
        out_len = (n_frames - 1) * self.hop + self.win_len
        wav = np.zeros((b, out_len))
        env = np.zeros(out_len)
        for f in range(n_frames):
            sl = slice(f * self.hop, f * self.hop + self.win_len)
            wav[:, sl] += spec[:, f] @ self.syn
            env[sl] += self.window**2
        wav = wav / (env + 1e-8)
        pad = self.win_len - self.hop
        return wav[:, pad:-pad]


def torch_gru_forward(np_params: dict, x: np.ndarray) -> np.ndarray:
    """Run torch.nn.GRU with the given aec_tpu-layout params on x [B,T,I]."""
    hidden = np_params["w_hh"].shape[-1]
    inp = np_params["w_ih"].shape[-1]
    gru = torch.nn.GRU(inp, hidden, num_layers=1, batch_first=True, bias=True)
    with torch.no_grad():
        gru.weight_ih_l0.copy_(torch.from_numpy(np.asarray(np_params["w_ih"])))
        gru.weight_hh_l0.copy_(torch.from_numpy(np.asarray(np_params["w_hh"])))
        gru.bias_ih_l0.copy_(torch.from_numpy(np.asarray(np_params["b_ih"])))
        gru.bias_hh_l0.copy_(torch.from_numpy(np.asarray(np_params["b_hh"])))
        out, _ = gru(torch.from_numpy(x.astype(np.float32)))
    return out.numpy()


def oracle_little_net(
    np_params: dict,
    mic: np.ndarray,
    ref: np.ndarray,
    near: np.ndarray,
    erb: np.ndarray,
):
    """Full LittleNet forward per ERB.py:252-334, float64 DSP + torch GRU.

    Returns (wav [B, n], loss scalar, est_erb).
    """
    st = OracleStft()

    def pseudo_norm(x):
        t = torch.from_numpy(x.astype(np.float32))
        return (t - t.mean() / t.std()).numpy().astype(np.float64)

    mic, ref, near = pseudo_norm(mic), pseudo_norm(ref), pseudo_norm(near)
    k = st.k

    def erb_mag(spec):
        mag = np.sqrt(spec[..., :k] ** 2 + spec[..., k:] ** 2 + 1e-9)
        return mag @ erb

    mic_spec = st.stft(mic)
    mic_erb = erb_mag(mic_spec)
    ref_erb = erb_mag(st.stft(ref))
    near_erb = erb_mag(st.stft(near))

    feats = np.concatenate([mic_erb, np.abs(mic_erb - ref_erb)], axis=-1)
    out1 = torch_gru_forward(np_params["gru"], feats).astype(np.float64)
    hid = np.concatenate([out1, mic_erb], axis=-1)
    hid = np.maximum(hid @ np_params["lin1"]["w"].T.astype(np.float64) + np_params["lin1"]["b"], 0.0)
    z = hid @ np_params["lin2"]["w"].T.astype(np.float64) + np_params["lin2"]["b"]
    mask = 1.0 / (1.0 + np.exp(-z))

    est_erb = mask * mic_erb
    gain = est_erb @ erb.T
    out_spec = np.concatenate([gain * mic_spec[..., :k], gain * mic_spec[..., k:]], axis=-1)
    wav = st.istft(out_spec) + 1e-9

    t_frames, n_bands = near_erb.shape[1], erb.shape[1]
    loss = np.sum((np.sqrt(near_erb) - np.sqrt(est_erb)) ** 2) / (t_frames * n_bands)
    return wav, loss, est_erb
