"""Shared test helpers: random-but-valid H.261 symbol tensors."""

import numpy as np

from p64tpu.entropy.encode import FrameSymbols
from p64tpu.spec.constants import Format
from p64tpu.spec.tables import MTYPE_BY_NAME


def random_frame_symbols(fmt: Format, rng: np.random.Generator,
                         tr: int = 0, p_coded: float = 0.85,
                         p_intra: float = 0.3,
                         p_mquant: float = 0.0) -> FrameSymbols:
    n = fmt.num_mbs
    coded = rng.random(n) < p_coded
    intra = rng.random(n) < p_intra
    mc = (~intra) & (rng.random(n) < 0.6)
    fil = mc & (rng.random(n) < 0.5)
    mv = np.where(mc[:, None], rng.integers(-15, 16, (n, 2)), 0).astype(np.int32)
    # clip each MB's MV to the picture window (H.261 3.2.1: MVs must not
    # reference outside the picture; both parsers now reject such streams)
    mb_cols = fmt.width // 16
    y0 = (np.arange(n) // mb_cols) * 16
    x0 = (np.arange(n) % mb_cols) * 16
    mv[:, 0] = np.clip(mv[:, 0], -x0, fmt.width - 16 - x0)
    mv[:, 1] = np.clip(mv[:, 1], -y0, fmt.height - 16 - y0)

    levels = np.zeros((n, 6, 64), np.int16)
    sparse = rng.random((n, 6, 64)) < 0.08
    vals = rng.integers(-127, 128, (n, 6, 64))
    vals[vals == 0] = 1
    levels[sparse] = vals[sparse]
    # intra DC slot: 1..254
    dc = rng.integers(1, 255, (n, 6))
    levels[intra, :, 0] = dc[intra]
    # make ~half the inter blocks start with +/-1 to exercise the '1s' form
    first1 = (~intra)[:, None] & (rng.random((n, 6)) < 0.5) & sparse[:, :, 0]
    levels[:, :, 0] = np.where(first1, rng.choice([-1, 1], (n, 6)),
                               levels[:, :, 0])

    cbp = np.zeros(n, np.int32)
    nzblk = (levels != 0).any(axis=-1)
    for b in range(6):
        cbp |= nzblk[:, b].astype(np.int32) << (5 - b)

    mtype = np.zeros(n, np.int32)
    has_coef = cbp > 0
    mtype[intra] = MTYPE_BY_NAME["intra"]
    mtype[~intra & ~mc & has_coef] = MTYPE_BY_NAME["inter"]
    mtype[~intra & mc & ~fil & has_coef] = MTYPE_BY_NAME["inter_mc_coef"]
    mtype[~intra & mc & fil & has_coef] = MTYPE_BY_NAME["inter_fil_coef"]
    mtype[~intra & mc & ~fil & ~has_coef] = MTYPE_BY_NAME["inter_mc"]
    mtype[~intra & mc & fil & ~has_coef] = MTYPE_BY_NAME["inter_fil"]
    # inter, no mc, no coefficients -> cannot be coded
    coded &= ~(~intra & ~mc & ~has_coef)
    # zero out levels of uncoded MBs and of non-tcoeff MTYPEs
    no_tc = ~coded | (~intra & ~has_coef)
    levels[no_tc] = 0
    cbp[~coded] = 0
    mv[~coded] = 0

    gquant = rng.integers(1, 32, fmt.num_gobs).astype(np.int32)

    quant_mb = None
    if p_mquant > 0:
        from p64tpu.core.blocks import transmission_order
        upgrade = {MTYPE_BY_NAME["intra"]: MTYPE_BY_NAME["intra_mquant"],
                   MTYPE_BY_NAME["inter"]: MTYPE_BY_NAME["inter_mquant"],
                   MTYPE_BY_NAME["inter_mc_coef"]:
                       MTYPE_BY_NAME["inter_mc_mquant"],
                   MTYPE_BY_NAME["inter_fil_coef"]:
                       MTYPE_BY_NAME["inter_fil_mquant"]}
        eligible = coded & np.isin(mtype, list(upgrade))
        pick = eligible & (rng.random(n) < p_mquant)
        newq = rng.integers(1, 32, n).astype(np.int32)
        for base, mq in upgrade.items():
            mtype[pick & (mtype == base)] = mq
        # effective quantizer chain (GQUANT, updated at each MQUANT MB in
        # transmission order) -- exactly what a decoder reconstructs.
        quant_mb = np.zeros(n, np.int32)
        perm = transmission_order(fmt)
        mbs_per_gob = perm.size // fmt.num_gobs
        for gi in range(fmt.num_gobs):
            eff = int(gquant[gi])
            for idx in range(mbs_per_gob):
                raster = int(perm[gi * mbs_per_gob + idx])
                if pick[raster]:
                    eff = int(newq[raster])
                quant_mb[raster] = eff

    return FrameSymbols(tr=tr, gquant=gquant, coded=coded, mtype=mtype,
                        mv=mv, cbp=cbp, levels=levels, quant_mb=quant_mb)
