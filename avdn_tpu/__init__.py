"""avdn_tpu — TPU-native framework for Aerial Vision-and-Dialog Navigation (ANDH).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
eric-ai-lab/Aerial-Vision-and-Dialog-Navigation (reference layout: /root/reference):

- ``geometry``  : batched, jit-compatible quad geometry (IoU, clipping, hulls)
- ``sim``       : the drone simulator — view dynamics, teacher oracle, renderer —
                  all on-device, one copy (the reference duplicates these inside
                  each agent, src/xview_et/agent.py:285-507)
- ``ops``       : Pallas TPU kernels for the hot paths (perspective warp, NSS)
- ``models``    : flax implementations of the HAA-Transformer ("ET") and HAA-LSTM
                  model families plus the BERT language tower and Darknet vision
                  tower (reference: src/models/)
- ``rollout``   : the episode engine — a single lax.scan covering render → encode
                  → act → step (reference hot loop: src/xview_et/agent.py:512-894)
- ``train``     : optax multi-optimizer training step under pjit / device meshes
- ``metrics``   : SR / SPL / GP / IoU / NSS navigation metrics (src/env.py:335-475)
- ``parallel``  : mesh + sharding utilities (XLA collectives over ICI, not NCCL)
- ``data``      : annotation loading, map preprocessing, tokenizer, batcher
- ``compat``    : PyTorch checkpoint → flax parameter importers
"""

__version__ = "0.1.0"
