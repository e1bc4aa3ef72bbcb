"""End-user applications built on the XMC/ANN stacks."""
