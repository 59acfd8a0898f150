"""L5 optimizers: JAX-native Levenberg-Marquardt replacing the reference's g2o
(``optimize/``: pose_optimizer, local/global BA, Sim3 graph/transform)."""
