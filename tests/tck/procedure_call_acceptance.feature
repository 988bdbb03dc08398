Feature: ProcedureCallAcceptance

  # The official openCypher TCK's ad-hoc procedure mechanism
  # (`And there exists a procedure <sig>:` + lookup table), written in the
  # identical format so the official ProcedureCallAcceptance family runs
  # when OPENCYPHER_TCK_DIR is present. Runner support:
  # tck/runner.py register_tck_procedure (round 8).

  Scenario: Standalone call to a procedure with no arguments
    Given an empty graph
    And there exists a procedure test.labels() :: (label :: STRING?):
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    When executing query:
      """
      CALL test.labels()
      """
    Then the result should be, in order:
      | label |
      | 'A'   |
      | 'B'   |
      | 'C'   |
    And no side effects

  Scenario: In-query call to a procedure with an argument
    Given an empty graph
    And there exists a procedure test.my.proc(in :: INTEGER?) :: (out :: INTEGER?):
      | in | out |
      | 1  | 2   |
      | 2  | 4   |
      | 3  | 6   |
    When executing query:
      """
      UNWIND [1, 2, 3] AS i
      CALL { RETURN 0 AS zero }
      CALL test.my.proc(2) YIELD out
      RETURN i, out
      """
    Then the result should be, in any order:
      | i | out |
      | 1 | 4   |
      | 2 | 4   |
      | 3 | 4   |
    And no side effects

  Scenario: In-query call to a procedure that takes no arguments and yields no results
    Given an empty graph
    And there exists a procedure test.empty(in :: STRING?) :: (out :: STRING?):
      | in | out |
    When executing query:
      """
      CALL test.empty('x') YIELD out RETURN out
      """
    Then the result should be empty

  Scenario: Calling a procedure with multiple outputs and YIELD *
    Given an empty graph
    And there exists a procedure test.pair(k :: STRING?) :: (name :: STRING?, age :: INTEGER?):
      | k    | name  | age |
      | 'x'  | 'ann' | 30  |
      | 'x'  | 'bob' | 40  |
      | 'y'  | 'cat' | 50  |
    When executing query:
      """
      CALL test.pair('x') YIELD *
      RETURN name, age
      """
    Then the result should be, in any order:
      | name  | age |
      | 'ann' | 30  |
      | 'bob' | 40  |
    And no side effects

  Scenario: Procedure yielding a list argument-matched by value
    Given an empty graph
    And there exists a procedure test.lists(in :: LIST OF INTEGER?) :: (sum :: INTEGER?):
      | in        | sum |
      | [1, 2]    | 3   |
      | [1, 2, 3] | 6   |
    When executing query:
      """
      CALL test.lists([1, 2, 3]) YIELD sum RETURN sum
      """
    Then the result should be, in any order:
      | sum |
      | 6   |
    And no side effects

  Scenario: Calling a procedure with the wrong argument count fails
    Given an empty graph
    And there exists a procedure test.one(in :: INTEGER?) :: (out :: INTEGER?):
      | in | out |
      | 1  | 1   |
    When executing query:
      """
      CALL test.one() YIELD out RETURN out
      """
    Then a SyntaxError should be raised at compile time: InvalidNumberOfArguments
