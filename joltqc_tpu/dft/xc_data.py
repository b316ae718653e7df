"""Parameter tables for B97-family (incl. range-separated / meta-GGA) XC.

The reference evaluates these functionals through libxc (GPU4PySCF
``ni.eval_xc_eff``, /root/reference/jqc/pyscf/rks.py:341).  No libxc is
available in this environment, so the functionals are implemented from
their defining papers; this module isolates the *data* so it can be
audited/corrected independently of the machinery (dft/xc.py).

Conventions:
 - ``x``  : inhomogeneity coefficients for the exchange series
 - ``css``: same-spin correlation series
 - ``cos``: opposite-spin correlation series
 - GGA series (B97, wB97X-V): list [c0, c1, c2, ...] in powers of
   u = gamma*x^2/(1+gamma*x^2)
 - mGGA series (wB97M-V): dict {(i, j): c} for  c * w^i * u^j  with
   w = (t-1)/(t+1), t = tau_unif/tau
 - ``gamma``: (gamma_x, gamma_ss, gamma_os); B97-standard
   (0.004, 0.2, 0.006) for every member.

Provenance / verification status:
 - B97:      Becke, J. Chem. Phys. 107, 8554 (1997), Table II.  VERIFIED
             by the UEG-limit identities in tests/test_xc_b97.py.
 - wB97X-V:  Mardirossian & Head-Gordon, PCCP 16, 9904 (2014), Table 3.
             10-parameter form: 3 exchange + 2 css + 2 cos (+ cx_sr,
             omega, VV10 b, C).
 - wB97M-V:  REMOVED.  A from-memory reconstruction of the JCP 144,
             214110 (2016) Table 3 data was tested against the published
             H2O/def2-tzvpp SCF anchor -76.4334218842 (ref
             test_dft.py:105) with the full self-consistent pipeline
             (the B3LYP control on the same pipeline matched its anchor
             to 4.5e-8 Ha) and missed by +1.06 Ha -- the recalled term
             selection/coefficients are wrong.  Per the round-2 verdict
             (verify or delete), the alias was deleted rather than
             shipped; the mGGA B97 series machinery (dft/xc.py) remains
             and takes a verified parameter set whenever one can be
             sourced.
             Round 4: benchmarks/wb97mv_screen.py turns candidate
             verification into a seconds-cost check (Exc is linear in
             the series coefficients -> precomputed moment integrals at
             a frozen density; calibrated to ~1-2 mHa against a full
             SCF).  Every curated from-memory candidate missed by
             15-130 mHa, and a blind (i,j)-assignment search showed one
             anchor equation admits thousands of accidental matches --
             so the data CANNOT be reconstructed from memory + one
             anchor; no auditable source (libxc/pyscf/wheel) exists in
             this environment (verified by search).  The gate stands;
             the screen verifies any future externally-sourced set
             before it ships.
"""

B97_GAMMA = (0.004, 0.2, 0.006)

FUNCTIONALS = {
    # Becke 1997 hybrid GGA: 19.43% exact exchange.
    "b97": dict(
        family="gga",
        series="gga",
        x=[0.8094, 0.5073, 0.7481],
        css=[0.1737, 2.3487, -2.4868],
        cos=[0.9454, 0.7471, -4.5961],
        hyb=0.1943,
        alpha=0.1943,
        omega=0.0,
        nlc=None,
    ),
    # wB97X-V: RSH GGA + VV10. SR-HF 16.7%, LR-HF 100%, omega=0.3.
    "wb97x-v": dict(
        family="gga",
        series="gga",
        x=[0.833, 0.603, 1.194],
        css=[0.556, -0.257],
        cos=[1.219, -1.850],
        hyb=0.167,
        alpha=1.0,
        omega=0.3,
        nlc=(6.0, 0.01),
    ),
}
