"""Inception Score (parity target: reference metrics/inception_score.py).

Class-probability extraction runs batched on TPU (InceptionV3 logits →
softmax); the split/KL computation stays in numpy exactly as the reference
(inception_score.py:58-83): 10 splits, exp(mean KL(p(y|x) || p(y))).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .inception import InceptionFeatures


class InceptionScore:
    """IS calculator (API parity: inception_score.py:13-83).

    `logits_fn`: optional override mapping (B, H, W, C) [0,1] images to
    (B, K) class logits; defaults to the InceptionV3 port.
    """

    def __init__(
        self,
        logits_fn: Optional[Callable] = None,
        weights_path: Optional[str] = None,
        inception: Optional[InceptionFeatures] = None,
    ):
        if logits_fn is None:
            # shared extractor support — see FIDScore.__init__
            self._inception = inception or InceptionFeatures(weights_path)
            if not self._inception.calibrated:
                print(
                    "WARNING: InceptionV3 weights not found — IS values are "
                    "uncalibrated."
                )
            logits_fn = lambda batch: self._inception(batch)[1]
        self.logits_fn = logits_fn

    def compute_inception_score(self, images, batch_size: int = 32,
                                splits: int = 10):
        n = len(images)
        preds = []
        for start in range(0, n, batch_size):
            batch = jnp.asarray(images[start : start + batch_size])
            logits = self.logits_fn(batch)
            preds.append(np.asarray(jax.nn.softmax(logits, axis=1)))
        preds = np.concatenate(preds, axis=0)

        split_scores = []
        split_size = n // splits
        for k in range(splits):
            part = preds[k * split_size : (k + 1) * split_size]
            py = np.mean(part, axis=0)
            kl = part * (np.log(part + 1e-10) - np.log(py + 1e-10))
            kl = np.mean(np.sum(kl, axis=1))
            split_scores.append(np.exp(kl))
        return np.mean(split_scores), np.std(split_scores)
