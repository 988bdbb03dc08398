Feature: Comparability

  Scenario: Equality between integer and float of equal value
    Given an empty graph
    When executing query:
      """
      RETURN 1 = 1.0 AS a, 2 = 2.5 AS b, 0.5 = 0.5 AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |
    And no side effects

  Scenario: Equality involving null is null
    Given an empty graph
    When executing query:
      """
      RETURN null = null AS a, 1 = null AS b, null <> null AS c
      """
    Then the result should be, in any order:
      | a    | b    | c    |
      | null | null | null |
    And no side effects

  Scenario: List equality is element-wise
    Given an empty graph
    When executing query:
      """
      RETURN [1, 2] = [1, 2.0] AS a, [1, 2] = [2, 1] AS b, [] = [] AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |
    And no side effects

  Scenario: Incomparable types compare to null
    Given an empty graph
    When executing query:
      """
      RETURN 'a' < 1 AS a, true > 0 AS b
      """
    Then the result should be, in any order:
      | a    | b    |
      | null | null |
    And no side effects

  Scenario: String comparison is lexicographic
    Given an empty graph
    When executing query:
      """
      RETURN 'abc' < 'abd' AS a, 'abc' <= 'ab' AS b, '' < 'a' AS c
      """
    Then the result should be, in any order:
      | a    | b     | c    |
      | true | false | true |
    And no side effects

  Scenario: Ternary logic for AND and OR
    Given an empty graph
    When executing query:
      """
      RETURN (null AND true) AS a, (null AND false) AS b,
             (null OR true) AS c, (null OR false) AS d
      """
    Then the result should be, in any order:
      | a    | b     | c    | d    |
      | null | false | true | null |
    And no side effects

  Scenario: WHERE filters out null predicates
    Given an empty graph
    And having executed:
      """
      CREATE (:N {v: 1}), (:N {v: 2}), (:N)
      """
    When executing query:
      """
      MATCH (n:N) WHERE n.v > 1 RETURN n.v AS v
      """
    Then the result should be, in any order:
      | v |
      | 2 |
    And no side effects
