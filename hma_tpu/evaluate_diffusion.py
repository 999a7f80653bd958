"""Name-parity alias: the reference calls its continuous evaluator
`hma/evaluate_diffusion.py` while its README advertises
`evaluate_feature.py` (which never existed there). Both names work here.
"""

from hma_tpu.evaluate_feature import load_mar_model, main, parse_args  # noqa: F401

if __name__ == "__main__":
    main()
