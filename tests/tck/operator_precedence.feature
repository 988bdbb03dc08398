Feature: OperatorPrecedence

  # Precedence/associativity corners from the openCypher grammar
  # (PowerOfExpression folds left; unary minus is the operand of power;
  # comparison chains are conjunctions).

  Background:
    Given an empty graph

  Scenario: Exponentiation is left-associative
    When executing query:
      """
      RETURN 2 ^ 3 ^ 2 AS v
      """
    Then the result should be, in any order:
      | v    |
      | 64.0 |
    And no side effects

  Scenario: Unary minus binds tighter than exponentiation
    When executing query:
      """
      RETURN -2 ^ 2 AS v
      """
    Then the result should be, in any order:
      | v   |
      | 4.0 |
    And no side effects

  Scenario: Exponent may be a negative unary expression
    When executing query:
      """
      RETURN 2 ^ -1 AS v
      """
    Then the result should be, in any order:
      | v   |
      | 0.5 |
    And no side effects

  Scenario: Power binds tighter than multiplication
    When executing query:
      """
      RETURN 2 * 3 ^ 2 AS v
      """
    Then the result should be, in any order:
      | v    |
      | 18.0 |
    And no side effects

  Scenario: Comparison chains are conjunctions
    When executing query:
      """
      RETURN 1 < 2 < 3 AS a, 3 > 2 > 2 AS b
      """
    Then the result should be, in any order:
      | a    | b     |
      | true | false |
    And no side effects

  Scenario: A null link makes the whole comparison chain null
    When executing query:
      """
      RETURN 1 < 2 < null AS v
      """
    Then the result should be, in any order:
      | v    |
      | null |
    And no side effects

  Scenario: A false link short-circuits a null link
    When executing query:
      """
      RETURN 2 < 1 < null AS v
      """
    Then the result should be, in any order:
      | v     |
      | false |
    And no side effects

  Scenario: Modulo keeps the dividend sign
    When executing query:
      """
      RETURN 5 % 3 AS a, -5 % 3 AS b, 5 % -3 AS c
      """
    Then the result should be, in any order:
      | a | b  | c |
      | 2 | -2 | 2 |
    And no side effects
