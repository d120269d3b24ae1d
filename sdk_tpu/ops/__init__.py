"""sdk_tpu.ops — the TPU (JAX/XLA/Pallas) server compute plane.

TPUs have no native 64-bit integers, so all mod-q arithmetic is built from
uint32 lanes (modops), with the MXU engaged via 8-bit limb decomposition for
the big matmuls (dbscan). Layout convention for NTT-domain data on device:
one uint32 array per CRT channel, poly coefficient axis last (128-lane
friendly at poly_len = 2048).
"""
