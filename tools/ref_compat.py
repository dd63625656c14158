"""Shims so the reference espnet fork imports in THIS image (no pip installs).

The image lacks humanfriendly / torch_complex / librosa, which the reference
frontend path imports (espnet2/asr/frontend/default.py:4-11,
espnet2/layers/log_mel.py:3).  Each shim covers exactly the API surface the
reference uses; the mel filterbank reuses this package's Slaney-formula
implementation (the librosa formula, parity-tested in tests/test_frontend.py).

Usage (fixture generators / reference benches only — never product code):
    sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/reference")
    from tools.ref_compat import install_reference_shims
    install_reference_shims()
"""

import sys
import types


def install_reference_shims():
    # humanfriendly.parse_size: only called on STRING sample rates
    # (default.py:43)
    hf = types.ModuleType("humanfriendly")
    hf.parse_size = lambda s: int(str(s).lower().replace("k", "000"))
    sys.modules.setdefault("humanfriendly", hf)

    # torch_complex.ComplexTensor: frontend uses construction + .real/.imag
    # (default.py:89,109)
    class _ComplexTensor:
        def __init__(self, real, imag):
            self.real, self.imag = real, imag

        def size(self, *a):
            return self.real.size(*a)

        def dim(self):
            return self.real.dim()

        @property
        def shape(self):
            return self.real.shape

        def __getitem__(self, idx):
            return _ComplexTensor(self.real[idx], self.imag[idx])

    tc = types.ModuleType("torch_complex")
    tct = types.ModuleType("torch_complex.tensor")
    tct.ComplexTensor = _ComplexTensor
    tc.tensor = tct
    tc.functional = types.ModuleType("torch_complex.functional")
    sys.modules.setdefault("torch_complex", tc)
    sys.modules.setdefault("torch_complex.tensor", tct)
    sys.modules.setdefault("torch_complex.functional", tc.functional)

    # librosa.filters.mel (log_mel.py:50)
    from llm_guided_asr_tpu.ops.frontend import mel_filterbank

    lb = types.ModuleType("librosa")
    lb.filters = types.ModuleType("librosa.filters")

    def _mel(*, sr, n_fft, n_mels, fmin=0.0, fmax=None, htk=False, **kw):
        return mel_filterbank(
            fs=sr, n_fft=n_fft, n_mels=n_mels, fmin=fmin or 0.0,
            fmax=fmax, htk=htk,
        ).T  # librosa layout [n_mels, F]

    lb.filters.mel = _mel
    sys.modules.setdefault("librosa", lb)
    sys.modules.setdefault("librosa.filters", lb.filters)

    # DefaultFrontend imports the optional WPE/beamformer Frontend
    # (default.py:14) whose import chain needs torchaudio/pytorch_wpe — not
    # in the image and never exercised (we always run frontend_conf without
    # the enhancement sub-frontend).  Stub the module with a clear failure
    # if anyone actually instantiates it.
    import torch

    class _UnavailableFrontend(torch.nn.Module):
        def __init__(self, *a, **kw):
            raise ModuleNotFoundError(
                "WPE/beamformer Frontend needs torchaudio (absent from image)"
            )

    fe = types.ModuleType("espnet.nets.pytorch_backend.frontends.frontend")
    fe.Frontend = _UnavailableFrontend
    sys.modules.setdefault(
        "espnet.nets.pytorch_backend.frontends.frontend", fe
    )
