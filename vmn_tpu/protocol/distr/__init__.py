"""Distributed-protocol substrate (reference: protocol.distr,
protocol.secretsharing): distributed key generation, verifiable secret
sharing, independent generators."""
