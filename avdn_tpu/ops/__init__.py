from avdn_tpu.ops.losses import nss_loss, heading_of, step_losses

__all__ = ["nss_loss", "heading_of", "step_losses"]
